"""MinHash-LSH banding parameter planner — the S-curve analysis that picks
(bands, rows_per_band) for a permutation budget and a target Jaccard
threshold (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).

For b bands of r rows (b*r = P permutations), a pair with Jaccard s
becomes an LSH candidate with probability p(s) = 1 - (1 - s^r)^b. The
planner tabulates, for every divisor split of P:

  - s50: the curve's midpoint (1/b)^(1/r) — where candidacy hits 50%
  - fp_mass: Σ p(s) over the s-grid BELOW the threshold (wasted verify
    work under a uniform pair-similarity density)
  - fn_mass: Σ (1 - p(s)) over the grid AT/ABOVE it (missed near-dups)
  - objective: fp_mass + fn_mass — minimize to pick the banding

This is the question every dedup deployment asks first; the repo's own
default (16 bands × 8 rows at threshold 0.7) sits at this table's
objective minimum.

Engine determinism: s^r and (1-s^r)^b are evaluated as IDENTICAL
square-and-multiply chains in Spark and in the SQL oracle — both emitted
by one generator (the jl_projection trick), so every intermediate double
is bit-identical; each grid point's p is then quantized to a bigint
(floor(p*1e6)) before summing, making the masses exact integer sums,
order-independent.

Scale shape: the whole computation is |divisors(P)| × 19 rows of pure
codegen arithmetic — a driver-sized planning table, no data scan at all.
It lives here (not a notebook) so the plan and the production banding
share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

S_GRID = 19  # s = i/20 for i in 1..19


def _divisor_pairs(perms: int) -> list:
    return [(b, perms // b) for b in range(1, perms + 1) if perms % b == 0]


def _pow_steps(n: int) -> list:
    """Square-and-multiply op list for x^n: 'S' = square acc, 'M' =
    multiply acc by x — MSB-first binary method, shared by both emitters."""
    assert n >= 1
    steps = []
    for bit in bin(n)[3:]:  # skip the leading 1: acc starts at x
        steps.append("S")
        if bit == "1":
            steps.append("M")
    return steps


def _pow_col(x, n: int):
    acc = x
    for op in _pow_steps(n):
        acc = acc * acc if op == "S" else acc * x
    return acc


def _pow_sql(x: str, n: int) -> str:
    acc = x
    for op in _pow_steps(n):
        acc = f"({acc} * {acc})" if op == "S" else f"({acc} * {x})"
    return acc


def lsh_parameter_plan(
    spark: SparkSession, perms: int = 128, threshold: float = 0.7
) -> DataFrame:
    """One row per (bands, rows_per_band) split of ``perms``; see module
    docstring for the columns. ``threshold`` splits the s-grid into the
    false-positive and false-negative regions."""
    cut = int(float(threshold) * 20.0)  # s = i/20 < threshold  <=>  i < cut
    parts = []
    for b, r in _divisor_pairs(perms):
        s = (F.col("i").cast("double") / F.lit(20.0))
        p = F.lit(1.0) - _pow_col(F.lit(1.0) - _pow_col(s, r), b)
        pq = F.floor(p * 1e6).cast("long")
        grid = (
            spark.range(1, S_GRID + 1)
            .select(F.col("id").cast("int").alias("i"))
            .select(
                "i",
                pq.alias("pq"),
            )
        )
        parts.append(
            grid.agg(
                F.lit(b).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                F.sum(F.when(F.col("i") < cut, F.col("pq")).otherwise(0)).alias("fpq"),
                F.sum(
                    F.when(F.col("i") >= cut, F.lit(1_000_000) - F.col("pq")).otherwise(0)
                ).alias("fnq"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    s50 = F.pow(F.lit(1.0) / F.col("bands").cast("double"), F.lit(1.0) / F.col("rows_per_band"))
    return out.select(
        "bands",
        "rows_per_band",
        (F.floor(s50 * 10000.0 + 0.5) / 10000.0).alias("s50"),
        (F.col("fpq").cast("double") / 1e6).alias("fp_mass"),
        (F.col("fnq").cast("double") / 1e6).alias("fn_mass"),
        ((F.col("fpq") + F.col("fnq")).cast("double") / 1e6).alias("objective"),
    )


def lsh_parameter_plan_sql(perms: int = 128, threshold: float = 0.7) -> str:
    """The DuckDB mirror: same divisor pairs, same square-and-multiply
    chains, same 1e6 quantization — from this one module."""
    cut = int(float(threshold) * 20.0)
    branches = []
    for b, r in _divisor_pairs(perms):
        s = "(i::double / 20.0)"
        sr = _pow_sql(s, r)
        p = f"(1.0 - {_pow_sql(f'(1.0 - {sr})', b)})"
        branches.append(
            f"""
SELECT {b} AS bands, {r} AS rows_per_band,
       sum(CASE WHEN i < {cut} THEN floor({p} * 1e6)::bigint ELSE 0 END) AS fpq,
       sum(CASE WHEN i >= {cut} THEN 1000000 - floor({p} * 1e6)::bigint ELSE 0 END) AS fnq
FROM generate_series(1, {S_GRID}) AS t(i)"""
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH masses AS ({union})
SELECT bands, rows_per_band,
       floor(pow(1.0 / bands::double, 1.0 / rows_per_band) * 10000.0 + 0.5) / 10000.0 AS s50,
       fpq::double / 1e6 AS fp_mass,
       fnq::double / 1e6 AS fn_mass,
       (fpq + fnq)::double / 1e6 AS objective
FROM masses
"""
