"""Snapshot diff + salted two-phase domain top-k."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from readability_spark.operators.snapshots import domain_top_k, snapshot_diff

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_snapshot_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id int, text string"
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_hashes_before_join(spark):
    """The shuffle must carry md5 hashes, not document bodies: the join's
    projected columns are (key, 32-char hash) only."""
    old = spark.read.parquet(f"{SF}/documents.parquet")
    plan = snapshot_diff(old, old)._jdf.queryExecution().executedPlan().toString()
    assert "md5" in plan
    # parents print before children: the md5 Project must sit BELOW the
    # Exchange (computed pre-shuffle), so 'Exchange' appears first
    assert plan.index("Exchange") < plan.index("md5"), plan
    # and the join itself keys on doc_id, not text
    join_line = [l for l in plan.splitlines() if "Join" in l][0]
    assert "text" not in join_line, join_line


def test_domain_top_k_matches_single_window(spark):
    """Two-phase salted ranking must equal the naive one-window plan,
    including on a host with far more rows than k*n_salts."""
    rows = [("big", i, (i * 37) % 997) for i in range(5000)] + [
        ("small", 10000 + i, i) for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, n_chars int")
    got = {
        (r.host, r.doc_id, r.rk)
        for r in domain_top_k(docs, k=7, n_salts=16).collect()
    }
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    want = {
        (r.source, r.doc_id, r.rk)
        for r in docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 7)
        .collect()
    }
    assert got == want
    assert len([t for t in got if t[0] == "small"]) == 3  # fewer than k kept all


def test_snapshot_triage_three_way_classification(spark):
    from pyspark.sql import functions as F

    from readability_spark.operators.snapshots import snapshot_triage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 1).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 2, F.concat("text", F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    rows = {r.doc_id: r for r in snapshot_triage(old, new).collect()}
    assert len(rows) == new.count()
    by_status: dict = {}
    for did, r in rows.items():
        by_status.setdefault(r.status, []).append(did)
        if r.status == "exact_dup":
            # unmutated doc whose content exists in old
            assert did % 7 != 2 and did % 3 != 0
            assert r.max_jaccard == 1.0
        elif r.status == "near_dup":
            assert r.max_jaccard is not None and r.max_jaccard >= 0.5
            assert r.max_jaccard < 1.0 or did % 7 == 2
        else:
            assert r.max_jaccard is None or r.max_jaccard < 0.5
    # all three branches fire on this corpus
    assert set(by_status) == {"exact_dup", "near_dup", "new"}, {
        k: len(v) for k, v in by_status.items()
    }
    # every v2-mutated doc whose original sits in old is caught as near-dup
    for did in rows:
        if did % 7 == 2 and did % 3 != 0:
            assert rows[did].status == "near_dup", (did, rows[did])
