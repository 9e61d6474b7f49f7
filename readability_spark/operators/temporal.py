"""Temporal joins the DataFrame API lacks as primitives: as-of join and
interval (range-overlap) join, built scale-first.

- :func:`asof_join` — for every left row, the most recent right row with the
  same key and ``right.ts <= left.ts`` (the kdb/pandas ``merge_asof`` /
  Flink temporal-join semantic; what a crawl pipeline uses to stamp each
  fetch with the robots.txt / sitemap snapshot that governed it). The naive
  plan is a per-row inequality join (quadratic per key); this implementation
  is the union-window formulation: tag the sides, union, ONE shuffle on the
  key, and a running ``last(..., ignorenulls=True)`` over the ts-ordered
  stream per key. Cost is sort-merge-shuffle + a single forward pass —
  exactly the shape that survives 10^12 rows, because no key ever expands
  beyond its own row count and the window frame is the streaming-friendly
  UNBOUNDED PRECEDING .. CURRENT ROW.

- :func:`interval_join` — all (left, right) pairs with the same key and
  ``start <= ts < end``. A raw theta-join is a cartesian per key; this
  bucketizes time into width-``bucket`` cells, explodes each interval into
  the cells it overlaps (``sequence()``, JVM-side), equi-joins on
  (key, cell), then applies the exact predicate. Blow-up is bounded by
  interval_length / bucket + 1 per right row — choose ``bucket`` near the
  typical interval length and the join is a plain equi-shuffle that AQE can
  skew-split. Matches published stream-join bucketization (e.g. Flink's
  interval join internals), expressed in pure DataFrame ops.

Both emit no Python UDFs — every expression is JVM/codegen.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: str) -> Column:
    """Microseconds since epoch; tolerates TIMESTAMP_NTZ parquet columns
    (the cast's session-tz offset is constant, so differences and bucket
    membership are unaffected)."""
    return F.unix_micros(F.col(c).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: Sequence[str],
    right_id: Optional[str] = None,
    prefix: str = "asof_",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row per key
    with ``right.ts <= left.ts`` (ties on ts resolved toward the larger
    ``right_id``, deterministically).

    Output columns: all of ``left``'s, then ``{prefix}ts`` and
    ``{prefix}<col>`` for each of ``right_value_cols`` (null when no right
    row precedes the left row, or when the match is older than
    ``tolerance_seconds``).
    """
    rid = right_id or right_value_cols[0]
    val_cols = list(right_value_cols)

    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast("long").alias("_rord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in val_cols],
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        F.col(rid).cast("long").alias("_rord"),
        *[F.col(c).alias(f"_rv_{c}") for c in val_cols],
    )

    # Right rows sort before left rows at equal ts (side 0 < 1), so a right
    # row AT the left row's timestamp is visible to it; among equal-ts right
    # rows the largest right_id sorts last and therefore wins the running
    # last().  One shuffle (the window's partitioning), one forward pass.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    stamped = lhs.unionByName(rhs).select(
        "*",
        matched_ts.alias("_mts"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"_rv_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"_mv_{c}")
            for c in val_cols
        ],
    )

    out = stamped.where(F.col("_side") == 1)
    keep: Column = F.lit(True)
    if tolerance_seconds is not None:
        keep = (
            F.col("_mts").isNotNull()
            & (_us("_ts") - _us("_mts") <= int(tolerance_seconds * 1_000_000))
        )
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        F.when(keep, F.col("_mts")).alias(f"{prefix}{ts}"),
        *[F.when(keep, F.col(f"_mv_{c}")).alias(f"{prefix}{c}") for c in val_cols],
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """All (left row, interval row) pairs with equal ``key`` and
    ``start <= ts < end`` (half-open, the time-window convention).

    Implementation: time is cut into ``bucket_seconds`` cells; every
    interval is exploded onto the cells it overlaps (a ``sequence()`` of at
    most len/bucket + 1 longs — pick ``bucket_seconds`` near the typical
    interval length so the factor stays ~2); left rows map to one cell; the
    join is then a plain (key, cell) equi-join with the exact range
    predicate applied post-join. No pair is emitted twice because each left
    row lives in exactly one cell.

    Output: all interval columns (aliased ``iv_<col>`` on collision), then
    all left columns.
    """
    b = int(bucket_seconds) * 1_000_000  # microseconds
    cell = lambda c: F.floor(_us(c) / F.lit(b))  # noqa: E731

    iv_named = [
        (c, f"iv_{c}" if c in left.columns else c) for c in intervals.columns
    ]
    rhs = intervals.select(
        F.col(key).alias("_k"),
        F.explode(F.sequence(cell(start), cell(end))).alias("_cell"),
        F.col(start).alias("_start"),
        F.col(end).alias("_end"),
        *[F.col(c).alias(a) for c, a in iv_named],
    )
    lhs = left.select(
        F.col(key).alias("_k"),
        cell(ts).alias("_cell"),
        F.col(ts).alias("_ts"),
        *[F.col(c) for c in left.columns],
    )
    joined = lhs.join(rhs, ["_k", "_cell"]).where(
        (F.col("_start") <= F.col("_ts")) & (F.col("_ts") < F.col("_end"))
    )
    return joined.select(
        *[F.col(a) for _, a in iv_named],
        *[F.col(c) for c in left.columns],
    )


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel over an event stream: a user reaches stage ``i``
    when they have a stage-``i`` event STRICTLY AFTER their earliest
    qualifying stage-``i-1`` event (the product-analytics semantic — later
    stages can't borrow events that happened before the funnel entered the
    previous step).

    Scale shape: stage times are chained conditional ``min(...) over
    (partition by user)`` windows — every window shares the one
    hash-partition on user, so the whole cascade is ONE Exchange however
    many stages there are; per-key state never exceeds the user's own rows
    (no self-join per stage, which is the naive k-pass formulation). The
    user table then collapses with a map-side-combined groupBy and a single
    global conditional aggregate; the k-row unpivot is driver-trivial.

    Output: one row per stage — ``(stage_idx, stage, n_users, conversion)``
    where conversion is n_users / previous stage's n_users (null for stage
    0), round-half-up to 4 decimals.
    """
    k = len(stages)
    df = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(type_col).alias("_et"),
    )
    w = Window.partitionBy("_u")
    for i, s in enumerate(stages):
        cond = F.col("_et") == s
        if i:
            prev = F.col(f"_t{i - 1}")
            cond = cond & prev.isNotNull() & (F.col("_ts") > prev)
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col("_ts"))).over(w))
    per_user = df.groupBy("_u").agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(k)]
    )
    row = per_user.agg(
        *[
            F.sum(F.col(f"_t{i}").isNotNull().cast("long")).alias(f"s{i}")
            for i in range(k)
        ]
    )
    conv = lambda i: (  # noqa: E731
        f"cast(null as double)"
        if i == 0
        else f"if(s{i - 1} = 0, cast(null as double), "
        f"floor(s{i} / cast(s{i - 1} as double) * 10000.0 + 0.5) / 10000.0)"
    )
    stack = ", ".join(
        f"{i}, '{s}', coalesce(s{i}, 0L), {conv(i)}" for i, s in enumerate(stages)
    )
    return row.selectExpr(
        f"stack({k}, {stack}) as (stage_idx, stage, n_users, conversion)"
    )


def detect_bursts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "1 hour",
    trail: int = 6,
    z_thresh: float = 2.5,
) -> DataFrame:
    """Per-key traffic-burst detection: bucket events into fixed windows,
    then z-score every bucket's count against the trailing ``trail``
    *observed* buckets of the same key (Kleinberg-style burst flagging
    reduced to its rolling-baseline form — what a crawl/ops pipeline runs
    over fetch or error streams to catch hot spots and spam floods).

    Output: (key, bucket_start, cnt, trail_n, z, is_burst) — one row per
    observed (key, bucket); ``z`` is NULL when fewer than 2 trailing
    buckets exist or their variance is 0, and ``is_burst`` is then false.

    Determinism: counts are integers, so the trailing sum / sum-of-squares
    are exact in any accumulation order; mean/variance/z are then a fixed
    IEEE expression tree over exact inputs (mirrored token-for-token in the
    SQL oracle), and z is rounded once at 1e-4.

    Scale shape at 100 TB: ONE map-side-combined count per (key, bucket) —
    the 10^12-event stream collapses to |keys|×|buckets| rows before the
    window pass — then one window sort per key over its own buckets (tiny:
    buckets-per-key, not events-per-key). No UDFs, all codegen; a hot key
    costs its bucket count, never its event count.
    """
    b = (
        events.groupBy(
            F.col(key_col).alias("key"), F.window(ts_col, bucket).alias("w")
        )
        .agg(F.count("*").alias("cnt"))
        .select("key", F.col("w.start").alias("bucket_start"), "cnt")
    )
    win = Window.partitionBy("key").orderBy("bucket_start").rowsBetween(-trail, -1)
    s = F.sum("cnt").over(win).cast("double")
    ss = F.sum(F.col("cnt") * F.col("cnt")).over(win).cast("double")
    w = F.count("cnt").over(win).cast("double")
    mean = s / w
    var = (ss - s * s / w) / (w - F.lit(1.0))
    z_raw = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    z = F.when(
        (w >= 2) & (var > 0), F.floor(z_raw * 10000.0 + 0.5) / 10000.0
    )
    return b.select(
        "key",
        "bucket_start",
        "cnt",
        w.cast("bigint").alias("trail_n"),
        z.alias("z"),
        F.coalesce(z >= z_thresh, F.lit(False)).alias("is_burst"),
    )
