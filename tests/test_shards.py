"""Rendezvous resharding, typosquat screening, and classifier calibration:
the properties the oracles can't see — HRW minimal movement, the subdomain
guard, and calibration-table invariants."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.shards import rendezvous_shard, reshard_plan
from readability_spark.operators.urltools import typosquat_candidates

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _keys(spark, n=400):
    return spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))


def test_hrw_growth_moves_only_to_new_shards(spark):
    """The HRW property: growing 8 -> 12 shards, a key either stays put or
    lands on one of the four NEW shards — never churns between survivors.
    This is what makes the plan minimal; modulo resharding fails it."""
    df = _keys(spark).select(
        rendezvous_shard(F.col("k"), 8).alias("old"),
        rendezvous_shard(F.col("k"), 12).alias("new"),
    )
    churn = df.filter((F.col("old") != F.col("new")) & (F.col("new") < 8)).count()
    assert churn == 0
    moved = df.filter(F.col("old") != F.col("new")).count()
    total = df.count()
    # expected movement = (12-8)/12 = 1/3 of keys; allow sampling noise
    assert 0.20 < moved / total < 0.47
    # modulo resharding on the same keys moves far more (~11/12)
    mod = _keys(spark).select(
        (F.abs(F.hash("k")) % 8).alias("old"), (F.abs(F.hash("k")) % 12).alias("new")
    )
    mod_moved = mod.filter(F.col("old") != F.col("new")).count()
    assert mod_moved / total > 2 * moved / total


def test_reshard_plan_accounts_every_key(spark):
    df = _keys(spark, 300)
    plan = reshard_plan(df, "k", n_old=8, n_new=12).collect()
    assert sum(r.n_keys for r in plan) == 300
    by_shard = {r.new_shard: r for r in plan}
    # moved keys land only on new shards 8..11
    for s, r in by_shard.items():
        if s < 8:
            assert r.n_moved_in == 0
        else:
            assert r.n_moved_in == r.n_keys  # everything on a new shard moved in
            assert r.moved_bytes > 0


def test_typosquat_detects_single_edit_and_guards_subdomains(spark):
    rows = (
        [("http://github.com/p%d" % i,) for i in range(60)]
        + [("http://example.com/p%d" % i,) for i in range(50)]
        + [("http://githib.com/x%d" % i,) for i in range(5)]  # 1-edit squat
        + [("http://a.github.com/y%d" % i,) for i in range(4)]  # legit subdomain
        + [("http://unrelated.net/z%d" % i,) for i in range(3)]
    )
    pages = spark.createDataFrame(rows, "url string")
    got = typosquat_candidates(pages, top_k=2, max_dist=2).collect()
    flagged = {(r.host, r.brand) for r in got}
    assert ("githib.com", "github.com") in flagged
    # the subdomain guard: a.github.com is within 2 edits but legitimate
    assert all(h != "a.github.com" for h, _ in flagged)
    assert all(h != b for h, b in flagged)
    by_host = {r.host: r for r in got}
    assert by_host["githib.com"].docs == 5 and by_host["githib.com"].dist == 1


def test_calibration_table_invariants(spark):
    from readability_spark.operators.classifier import (
        calibration_report,
        quality_features,
        score_logreg,
        train_logreg,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = quality_features(docs).cache()
    w = train_logreg(feats, lr=4.0, n_iter=16)
    scored = score_logreg(feats, w).cache()
    rows = calibration_report(scored, n_bins=10).collect()
    assert sum(r.n for r in rows) == scored.count()
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_p <= 1.0 and 0.0 <= r.pos_rate <= 1.0
        assert abs(r.gap - abs(r.mean_p - r.pos_rate)) < 2e-4
    # separable data + converged GD: the occupied extreme bins are pure
    ext = {r.bin: r for r in rows}
    if 0 in ext:
        assert ext[0].pos_rate <= 0.2
    if 9 in ext:
        assert ext[9].pos_rate >= 0.8


def test_fold_host_variants_election_and_counts(spark):
    """www/m/amp spellings of one page fold together; the representative
    prefers bare host, then www, then m, then amp, then url order."""
    from readability_spark.operators.urltools import fold_host_variants

    urls = [
        "http://www.example.com/p1",
        "http://m.example.com/p1",
        "http://amp.example.com/p1",
        "http://example.com/p1",
        "http://m.example.com/p2",
        "http://amp.example.com/p2",
        "http://other.org/p1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = {
        (r["canon_host"], r["path"]): r for r in fold_host_variants(df).collect()
    }
    p1 = out[("example.com", "/p1")]
    assert p1["n_variants"] == 4 and p1["n_urls"] == 4
    assert p1["rep_url"] == "http://example.com/p1"  # bare beats www/m/amp
    p2 = out[("example.com", "/p2")]
    assert p2["n_variants"] == 2
    assert p2["rep_url"] == "http://m.example.com/p2"  # m beats amp
    assert out[("other.org", "/p1")]["n_variants"] == 1


def test_crawl_trap_hosts_flags_low_content_hosts(spark):
    from readability_spark.operators.urltools import crawl_trap_hosts

    rows = []
    # trap.example: 40 urls, 2 distinct contents -> ratio 20
    for i in range(40):
        rows.append((f"http://trap.example/p{i}", f"content {i % 2}"))
    # ok.example: 40 urls, 40 distinct contents -> ratio 1
    for i in range(40):
        rows.append((f"http://ok.example/p{i}", f"unique text {i}"))
    # small.example: 4 urls, 1 content -> ratio 4 but below min_urls
    for i in range(4):
        rows.append((f"http://small.example/p{i}", "same"))
    df = spark.createDataFrame(rows, ["url", "text"])
    out = {r["host"]: r for r in crawl_trap_hosts(df, min_urls=10).collect()}
    assert out["trap.example"]["is_trap"]
    assert out["trap.example"]["urls_per_content"] == 20.0
    assert not out["ok.example"]["is_trap"]
    assert not out["small.example"]["is_trap"]  # volume floor
    assert out["small.example"]["urls_per_content"] == 4.0
