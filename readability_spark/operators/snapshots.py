"""Crawl-snapshot management: diff between two crawls, per-domain caps.

- :func:`snapshot_diff` — the monthly-recrawl primitive: classify every url
  as added / removed / changed / unchanged between two snapshots. The
  content columns are hashed *before* the join, so the one shuffle carries
  (key, 32-byte md5) — never document bodies — and the big-big equi-join is
  exactly the shape AQE handles (sort-merge + skew split) at any scale.

- :func:`domain_top_k` — anti-domination cap: keep at most k docs per host,
  best-first. The naive plan (one window over host) funnels a giant host's
  every row through one task's sort; this implementation is the salted
  two-phase top-k: rank within (host, salt) first — bounded partitions —
  then rank the <= k×n_salts survivors per host. Both phases are windows,
  but the second one's partitions are provably <= k×n_salts rows, so no
  host, however large, sorts more than that in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content: str = "text",
) -> DataFrame:
    """(key, status) for every key in either snapshot; status in
    added | removed | changed | unchanged (content compared by md5)."""
    o = old.select(F.col(key), F.md5(content).alias("_h_old"))
    n = new.select(F.col(key), F.md5(content).alias("_h_new"))
    joined = o.join(n, key, "full_outer")
    return joined.select(
        key,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def domain_top_k(
    docs: DataFrame,
    k: int,
    host_col: str = "source",
    n_salts: int = 16,
) -> DataFrame:
    """Keep the k best docs per host (order: n_chars DESC, doc_id ASC —
    fully deterministic), returning (host, doc_id, n_chars, rk).

    Two-phase so a 10^9-page host never sorts in one task: phase 1 ranks
    within (host, doc_id % n_salts) and keeps k per salt; phase 2 ranks the
    <= k * n_salts survivors per host. Correct because a row outside its
    salt group's top-k cannot be in the host's top-k.
    """
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    salt = (F.col("doc_id") % n_salts).alias("_salt")
    w1 = Window.partitionBy(F.col(host_col), F.col("_salt")).orderBy(*order)
    phase1 = (
        docs.select(host_col, "doc_id", "n_chars", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(F.col(host_col).alias("host"), "doc_id", "n_chars", "rk")
    )


def change_history(snapshots: list[DataFrame], key: str = "doc_id", content: str = "text") -> DataFrame:
    """Fold K consecutive snapshots into a per-key change ledger:
    (key, n_checks, n_changed) — n_checks counts the consecutive-pair
    comparisons where the key existed in both snapshots, n_changed how many
    of those saw a different content hash.

    Built by unioning the K-1 pairwise :func:`snapshot_diff` outputs and
    aggregating — one map-side-combined groupBy over (key, status) longs;
    'added'/'removed' rows don't count as checks (the url wasn't observable
    on both sides).
    """
    if len(snapshots) < 2:
        raise ValueError("change_history needs at least two snapshots")
    diffs = None
    for old, new in zip(snapshots, snapshots[1:]):
        d = snapshot_diff(old, new, key=key, content=content)
        diffs = d if diffs is None else diffs.unionByName(d)
    obs = diffs.filter(F.col("status").isin("changed", "unchanged"))
    return obs.groupBy(key).agg(
        F.count("*").alias("n_checks"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias("n_changed"),
    )


def refetch_schedule(
    history: DataFrame,
    check_interval_days: float = 30.0,
    min_days: float = 1.0,
    max_days: float = 365.0,
    key: str = "doc_id",
) -> DataFrame:
    """Per-key Poisson change-rate estimate and re-fetch interval from a
    (key, n_checks, n_changed) ledger observed at ``check_interval_days``
    cadence — the Cho & Garcia-Molina (2003) estimator for crawl frequency:

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / interval

    (the +0.5 terms are their bias correction, and keep the estimate finite
    when X = n — a page that changed on every check). The re-fetch interval
    is 1/lambda_hat clamped to [min_days, max_days]; a page never seen
    changing gets max_days.

    Output: (key, n_checks, n_changed, lambda_per_day, refetch_days) — the
    rates round4-floored so any engine reproduces them bit-for-bit. Pure
    projection over the ledger: zero shuffles at any scale.
    """
    from readability_spark.operators.dedup import round4

    n = F.col("n_checks").cast("double")
    x = F.col("n_changed").cast("double")
    lam = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / F.lit(float(check_interval_days))
    refetch = F.when(
        F.col("n_changed") == 0, F.lit(float(max_days))
    ).otherwise(
        F.least(F.greatest(F.lit(1.0) / lam, F.lit(float(min_days))), F.lit(float(max_days)))
    )
    return history.select(
        key,
        "n_checks",
        "n_changed",
        round4(lam).alias("lambda_per_day"),
        round4(refetch).alias("refetch_days"),
    )


def snapshot_triage(
    old: DataFrame, new: DataFrame, jaccard_threshold: float = 0.5
) -> DataFrame:
    """Three-way curation triage of a crawl increment against the prior
    corpus snapshot — the admit/skip/review decision per incoming page:
    ``exact_dup`` (content hash already in the old snapshot),
    ``near_dup`` (verified minhash neighbor >= threshold in the old
    snapshot), else ``new``. Combines the exact membership pass with
    :func:`~readability_spark.operators.dedup.incremental_minhash_new`'s
    banded history probe.

    Scale shape: the exact pass is one hash join on 32-hex content keys
    (production persists the history hash set); the near probe joins
    (band, key) short strings and verifies candidates only; the
    increment side is small by contract. Nothing driver-side.

    Output: (doc_id, status, max_jaccard) for every new doc.
    """
    from readability_spark.operators.dedup import incremental_minhash_new

    old_h = (
        old.select(F.md5("text").alias("_h"))
        .distinct()
        .withColumn("_ex", F.lit(True))
    )
    ex = new.select("doc_id", F.md5("text").alias("_h")).join(old_h, "_h", "left")
    inc = incremental_minhash_new(
        new, old, jaccard_threshold=jaccard_threshold
    ).select("doc_id", "max_jaccard", "is_new")
    return ex.join(inc, "doc_id").select(
        "doc_id",
        F.when(F.col("_ex"), F.lit("exact_dup"))
        .when(~F.col("is_new"), F.lit("near_dup"))
        .otherwise(F.lit("new"))
        .alias("status"),
        "max_jaccard",
    )
