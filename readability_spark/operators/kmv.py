"""K-minimum-values (KMV / bottom-k) sketches for distributed set algebra.

The sketch a 100-TB pipeline uses to answer "how much does segment A's
vocabulary overlap segment B's" without ever joining the raw token sets:
keep the k smallest distinct hash values per group (Bar-Yossef et al.
2002; the theta-sketch family generalises the same order-statistic).
Unlike HLL (see sketches.py) a KMV sketch supports *intersection* — the
k smallest of K(A) ∪ K(B) is a valid bottom-k sample of A ∪ B, and the
fraction of that sample present in both sketches estimates Jaccard.

Everything is deterministic and engine-portable so DuckDB can re-derive
the sketch bit-for-bit:

- item hash v = first 13 md5 nibbles as a 52-bit integer (the repo-wide
  md5 portability scheme shared with sketches.py);
- per-group sketch = the k smallest DISTINCT v: one longs-only shuffle
  (groupBy (grp, v) with map-side combine collapses duplicate tokens
  before the wire), then the salted two-phase top-k (snapshots.py's
  shape) so no group's full distinct-hash set ever sorts in one task;
- estimators stay integer until one final double division whose
  operands are all exactly representable (< 2^53), so both engines
  produce the identical IEEE-754 quotient:
    |A| ≈ (k-1) · 2^52 / h_k          (h_k = k-th smallest hash)
    J(A,B) ≈ |K∪ ∩ K(A) ∩ K(B)| / k   (K∪ = k smallest of K(A)∪K(B))
    |A∩B| ≈ J · |A∪B|
  with the exact-count fallback when a sketch has fewer than k rows
  (a KMV sketch holds exactly k values iff the set has ≥ k distinct
  members, so < k rows means the sketch IS the set).

Plan shape at scale: the (grp, v) distinct shuffle is the only one that
sees per-item rows; phases 2-3 operate on ≤ k·n_salts rows per group
and ≤ 2k rows per group pair — the pair window needs no salting because
its partitions are bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KMV_K = 128
KMV_SALTS = 16
KMV_SPACE = 1 << 52  # hash universe: 13 md5 nibbles


def kmv_sketch(
    df: DataFrame, group_col: str, item_col: str, k: int = KMV_K,
    n_salts: int = KMV_SALTS,
) -> DataFrame:
    """(grp, v, rk) — the k smallest distinct 52-bit item hashes per
    group, rk = 1-based rank. Phase 1 ranks within (grp, pmod(v, salts))
    and keeps k per salt — each of the group's true k smallest survives
    its own salt's cut — phase 2 ranks the ≤ k·n_salts survivors."""
    distinct = (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(
                f"cast(conv(substr(md5(cast({item_col} as string)), 1, 13), 16, 10) as bigint)"
            ).alias("v"),
        )
        .groupBy("grp", "v")
        .agg(F.lit(1).alias("_one"))
    )
    w1 = Window.partitionBy("grp", "_salt").orderBy("v")
    phase1 = (
        distinct.withColumn("_salt", F.pmod(F.col("v"), F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy("grp").orderBy("v")
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select("grp", "v", "rk")
    )


def kmv_distinct(sk: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-group distinct-count estimate from a kmv_sketch: exact row
    count when the sketch is exhaustive (< k rows), else (k-1)·U/h_k."""
    per = sk.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.max("v").alias("h_k")
    )
    est = F.when(
        F.col("n_rows") < k, F.col("n_rows").cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_SPACE)) / F.col("h_k").cast("double"))
    return per.select(
        "grp", "n_rows", "h_k", F.round(est, 4).alias("kmv_est")
    )


def kmv_set_ops(sk: DataFrame, k: int = KMV_K) -> DataFrame:
    """All-pairs set algebra over one kmv_sketch table: for every group
    pair (a < b) return union / Jaccard / intersection estimates plus
    the integer sketch internals (k_used, h_k, n_matches) so an external
    oracle can verify the order statistics themselves.

    The per-pair window is bounded at 2k rows by construction (each side
    contributes ≤ k sketch rows), so unlike the per-group sketch build
    it needs no salting. The groups table is tiny (one row per segment /
    source) and is broadcast onto the sketch."""
    groups = sk.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("a"))
        .crossJoin(groups.select(F.col("grp").alias("b")))
        .where(F.col("a") < F.col("b"))
    )
    ra = sk.join(F.broadcast(pairs), sk.grp == pairs.a).select(
        "a", "b", "v", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    rb = sk.join(F.broadcast(pairs), sk.grp == pairs.b).select(
        "a", "b", "v", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ra.unionByName(rb)
        .groupBy("a", "b", "v")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("a", "b").orderBy("v")
    union_sk = merged.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )
    per = union_sk.groupBy("a", "b").agg(
        F.count("*").alias("k_used"),
        F.max("v").alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_matches"),
    )
    union_est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_SPACE)) / F.col("h_k").cast("double"))
    jac = F.col("n_matches").cast("double") / F.col("k_used").cast("double")
    return per.select(
        F.col("a").alias("src_a"),
        F.col("b").alias("src_b"),
        "k_used",
        "h_k",
        "n_matches",
        F.round(union_est, 4).alias("union_est"),
        F.round(jac, 4).alias("jaccard_est"),
        F.round(jac * union_est, 4).alias("inter_est"),
    )
