"""Distributed cardinality sketches, rebuilt from the published algorithms.

HyperLogLog (Flajolet et al. 2007, with the standard linear-counting
small-range correction from the HLL/LogLog papers) as a pure DataFrame
plan — the sketch a 100-TB pipeline uses to answer "how many distinct
URLs / tokens / shingles per host" without shuffling the items
themselves. ``approx_count_distinct`` exists in Spark, but its register
layout is engine-private and can't be value-checked by an external
oracle; this implementation makes every intermediate portable:

- item hash = md5 (the repo-wide portability choice — identical string
  in Spark and DuckDB);
- bucket = first 3 hex nibbles (p=12, m=4096 registers);
- rho = leading-zero rank of the next 13 nibbles (w=52 bits), computed
  with integer/string ops only (``bin()`` length — no float log2);
- the register harmonic sum is kept EXACT as a decimal integer
  ``sum(1 << (53 - M))`` (max 4096·2^53 ≈ 3.7e19 < decimal(30)), so no
  float-addition-order divergence between engines can occur;
- every float constant (alpha·m²·2^53, the 2.5m threshold) is computed
  once in Python and embedded as the same IEEE-754 literal on both
  sides — bare SQL fractional literals are DECIMAL in both engines and
  would silently switch the arithmetic. The only remaining libm call is
  the one ``ln`` in the small-range branch, rounded to 4 dp both sides.

Plan shape at scale: one shuffle on (group, bucket) with map-side
partial max — register state is ≤ m rows per group regardless of item
count — then a tiny per-group agg. Items never cross the wire raw:
only (group, bucket ≤ 4096, rho ≤ 53) longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CMS_D = 4     # count-min hash rows
CMS_W = 4096  # columns per row = 3 hex nibbles, no modulo bias

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
HLL_W = 52          # hash suffix bits ranked for rho
# alpha_m for m >= 128 (Flajolet et al. §4), as one exact double constant
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator of the raw estimator with the 2^53 register-sum scaling
# folded in: raw = HLL_NUM / (sum(1 << (53-M)) + empty·2^53)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)
HLL_SMALL = 2.5 * HLL_M


def hll_registers(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(grp, bucket, register) — max leading-zero rank per bucket."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"substr(md5(cast({item_col} as string)), 1, 16)").alias("hx"),
    ).select(
        "grp",
        F.expr("cast(conv(substr(hx, 1, 3), 16, 10) as int)").alias("bucket"),
        F.expr("cast(conv(substr(hx, 4, 13), 16, 10) as bigint)").alias("v"),
    )
    rho = (
        F.when(F.col("v") == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.expr("bin(v)")))
    )
    return (
        base.select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(regs: DataFrame, label: str = "merged") -> DataFrame:
    """Merge register tables across groups: max register per bucket — the
    mergeability that makes HLL the right distributed sketch (per-shard
    sketches roll up to the whole-corpus sketch with NO rescan; commutative
    and idempotent, so retries and re-merges are free). Returns one
    (grp=label, bucket, register) table."""
    return regs.groupBy("bucket").agg(F.max("register").alias("register")).select(
        F.lit(label).alias("grp"), "bucket", "register"
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(grp, bucket, register) → per-group estimate row (the finalizer,
    shared by the direct, sharded, and merged paths)."""
    per_grp = regs.groupBy("grp").agg(
        F.count("*").alias("n_registers"),
        F.max("register").alias("max_register"),
        F.sum("register").cast("long").alias("sum_registers"),
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 53 - register) as decimal(20,0))")
        ).alias("sum_shift"),
    )
    total = (
        F.col("sum_shift")
        + (F.lit(HLL_M).cast("decimal(20,0)") - F.col("n_registers").cast("decimal(20,0)"))
        * F.lit(1 << 53).cast("decimal(20,0)")
    ).cast("double")
    raw = F.lit(HLL_NUM) / total
    empty = (F.lit(HLL_M) - F.col("n_registers")).cast("double")
    est = F.when(
        (raw <= F.lit(HLL_SMALL)) & (F.col("n_registers") < F.lit(HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / empty),
    ).otherwise(raw)
    return per_grp.select(
        "grp",
        "n_registers",
        "max_register",
        "sum_registers",
        F.round(raw, 4).alias("raw_est"),
        F.round(est, 4).alias("hll_est"),
    )


def hll_distinct(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Per-group HLL cardinality estimate. Returns
    (grp, n_registers, max_register, sum_registers, raw_est, hll_est) —
    the register-level integers are part of the output contract so an
    external oracle can verify the sketch state itself, not just the
    final float."""
    return hll_estimate(hll_registers(df, group_col, item_col))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — heavy-hitter counts
# ---------------------------------------------------------------------------

def _cms_cells(item_col: str):
    """d (row, bucket) cells per item; row j's hash = 3 md5 nibbles of
    the seed-prefixed item — independent rows from one md5 family."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(
                    f"cast(conv(substr(md5(concat('{j}:', cast({item_col} as string))), "
                    f"1, 3), 16, 10) as int)"
                ).alias("bucket"),
            )
            for j in range(CMS_D)
        ]
    )


def cms_table(df: DataFrame, item_col: str) -> DataFrame:
    """Build the d×w count table: (j, bucket, n). State is bounded at
    d·w = 16,384 rows no matter how many items stream in — the CMS
    property; the (j, bucket) shuffle carries partial counts only."""
    return (
        df.select(F.explode(_cms_cells(item_col)).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(table: DataFrame, queries: DataFrame, item_col: str) -> DataFrame:
    """Point-query the sketch: min over the d cells each query item maps
    to (the classic upward-biased estimator: est >= true count always).
    The table side is ≤ d·w rows → broadcast, zero shuffle on queries."""
    hashed = queries.select(
        F.col(item_col).alias("q_item"), F.explode(_cms_cells(item_col)).alias("c")
    ).select("q_item", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    joined = hashed.join(F.broadcast(table), ["j", "bucket"])
    return joined.groupBy("q_item").agg(F.min("n").alias("cms_est"))


# ---------------------------------------------------------------------------
# Log2 quantile histogram — mergeable percentiles with a bounded register set
# ---------------------------------------------------------------------------

QH_QUANTILES = (0.5, 0.9, 0.99)


def quantile_bins(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(grp, bin_lo, bin_hi, n) — a log2 histogram with 4 sub-buckets per
    octave (leading bit + next two bits), the integer-exact cousin of
    DDSketch/HdrHistogram buckets. Every bin's width is ≤ 25% of its lower
    bound, so any rank estimate read off the histogram has ≤ 25% relative
    error BY CONSTRUCTION. Registers are mergeable counts: per group the
    state is ≤ 4·64 + 4 rows no matter how many values stream in, and the
    (grp, bin) shuffle is map-side combined — values never cross the wire.

    Spark's own ``approx_percentile`` (t-digest) is the tighter built-in,
    but its centroid layout is engine-private; these registers are plain
    integers an external oracle can recompute bit-for-bit.
    """
    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("long").alias("_v")
    ).filter(F.col("_v") >= 1)
    binned = (
        base.withColumn("oct", F.length(F.expr("bin(_v)")) - F.lit(1))
        .withColumn(
            "bin_lo",
            F.when(F.col("oct") < 2, F.col("_v")).otherwise(
                F.expr("shiftleft(4 + (shiftright(_v, oct - 2) & 3), oct - 2)")
            ),
        )
        .withColumn(
            "bin_hi",
            F.when(F.col("oct") < 2, F.col("_v")).otherwise(
                F.col("bin_lo") + F.expr("shiftleft(cast(1 as bigint), oct - 2)") - 1
            ),
        )
    )
    return binned.groupBy("grp", "bin_lo", "bin_hi").agg(F.count("*").alias("n"))


def quantile_histogram_estimates(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple = QH_QUANTILES,
) -> DataFrame:
    """Per-group quantile estimates off the log2 histogram, next to the
    exact percentiles they approximate (the register-verifiable output
    contract, like hll_distinct). Rank rule: target rank r = ceil(q·n);
    the estimate linearly interpolates inside the first bin whose
    cumulative count reaches r. The cumulative window partitions by group
    over ≤ ~260 register rows — never a data-sized sort.

    Output: (grp, n_values, then per q: p{q}_est and p{q}_exact, round4).
    """
    from pyspark.sql import Window

    bins = quantile_bins(df, group_col, value_col)
    w = Window.partitionBy("grp").orderBy("bin_lo")
    cum = bins.withColumn("cum", F.sum("n").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("n")
    )
    totals = bins.groupBy("grp").agg(F.sum("n").alias("n_values"))
    joined = cum.join(totals, "grp")
    aggs = [F.first("n_values").alias("n_values")]
    for q in quantiles:
        r = F.ceil(F.lit(float(q)) * F.col("n_values")).cast("long")
        r = F.greatest(F.lit(1).cast("long"), r)
        in_bin = (F.col("cum") >= r) & (F.col("cum_before") < r)
        est = F.col("bin_lo") + (F.col("bin_hi") - F.col("bin_lo")) * (
            (r.cast("double") - F.col("cum_before") - F.lit(0.5)) / F.col("n")
        )
        est = F.floor(est * 10000.0 + 0.5) / 10000.0
        aggs.append(F.min(F.when(in_bin, est)).alias(f"p{int(q * 100)}_est"))
    sketch = joined.groupBy("grp").agg(*aggs)
    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("long").alias("_v")
    ).filter(F.col("_v") >= 1)
    exact = base.groupBy("grp").agg(
        *[
            (
                F.floor(
                    F.percentile("_v", F.lit(float(q))) * 10000.0 + 0.5
                ) / 10000.0
            ).alias(f"p{int(q * 100)}_exact")
            for q in quantiles
        ]
    )
    return sketch.join(exact, "grp")
