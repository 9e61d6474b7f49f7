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
