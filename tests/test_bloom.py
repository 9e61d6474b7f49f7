"""Bloom incremental dedup: no-false-negative guarantee, measured fpp,
exact equivalence to the plain anti-join, and pruning effectiveness."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.bloom import (
    bloom_params,
    bloom_probe,
    build_bloom,
    incremental_new_docs,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_bloom_params_shape():
    m, k = bloom_params(10_000, 0.01)
    assert m % 8 == 0
    assert 9 * 10_000 < m < 11 * 10_000  # ~9.6 bits/item at 1%
    assert 5 <= k <= 9  # optimum ~7


def test_no_false_negatives(spark):
    """Probing the history itself must return maybe_seen=True for every row
    — the property the definitely-new fast path depends on."""
    hist = spark.range(0, 5000).select(F.concat(F.lit("key-"), "id").alias("key"))
    bitmap, m, k = build_bloom(hist, "key")
    probed = bloom_probe(hist, bitmap, m, k, "key")
    assert probed.filter("NOT maybe_seen").count() == 0


def test_measured_fpp(spark):
    """A fully disjoint batch should bloom-positive at ≈ the target fpp."""
    hist = spark.range(0, 20000).select(F.concat(F.lit("h-"), "id").alias("key"))
    batch = spark.range(0, 20000).select(F.concat(F.lit("b-"), "id").alias("key"))
    bitmap, m, k = build_bloom(hist, "key", fpp=0.01)
    fp = bloom_probe(batch, bitmap, m, k, "key").filter("maybe_seen").count()
    assert fp / 20000 < 0.03  # ≤3x the 1% target


def test_incremental_equals_exact_anti_join(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    history = docs.filter("doc_id % 3 = 0")
    got = {
        r.doc_id
        for r in incremental_new_docs(docs, history, key_col="text").select("doc_id").collect()
    }
    want = {
        r.doc_id
        for r in docs.join(
            history.select("text").distinct(), "text", "left_anti"
        ).select("doc_id").collect()
    }
    assert got == want
    assert got  # non-degenerate: some docs are new
    assert len(got) < docs.count()  # ...and some were seen


def test_pruning_effectiveness(spark):
    """With a tiny overlap, almost the whole batch must skip the verify
    join (maybe_seen=False) — the point of the bloom layer."""
    hist = spark.range(0, 1000).select(F.concat(F.lit("h-"), "id").alias("key"))
    overlap = spark.range(0, 50).select(F.concat(F.lit("h-"), "id").alias("key"))
    fresh = spark.range(0, 10000).select(F.concat(F.lit("new-"), "id").alias("key"))
    batch = fresh.unionByName(overlap)
    bitmap, m, k = build_bloom(hist, "key", fpp=0.01)
    probed = bloom_probe(batch, bitmap, m, k, "key").cache()
    candidates = probed.filter("maybe_seen").count()
    assert candidates >= 50  # every true overlap is a candidate
    assert candidates <= 50 + int(0.03 * 10000)  # plus at most ~fpp of the fresh rows


def test_bitmap_deterministic(spark):
    hist = spark.range(0, 3000).select(F.concat(F.lit("k"), "id").alias("key"))
    b1, m1, k1 = build_bloom(hist, "key", n_items=3000)
    b2, m2, k2 = build_bloom(hist.repartition(7), "key", n_items=3000)
    assert (m1, k1) == (m2, k2)
    assert (b1 == b2).all()  # partition-independent (OR is commutative)
