"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning, the Delta/Iceberg ``OPTIMIZE ZORDER BY`` primitive.

At 100 TB the dominant cost is the scan; parquet min/max file statistics
prune it, but only along the physical sort order. Sorting by (host) prunes
host predicates and nothing else; interleaving the bits of TWO dimensions
(host bucket × time bucket) gives every file a tight bounding box in BOTH,
so either predicate skips most files.

:func:`zorder_key` builds the Morton code as a pure codegen bit-interleave
expression (no UDF — a sum of shift/mask terms Catalyst folds into one
projection). :func:`zorder_layout` assigns rows to files by the code's top
bits (space partitioning: deterministic, shuffle-only-on-write) and reports
each file's per-dimension bounding box — the statistics a pruning-power
audit reads. The same expression generator emits the DuckDB mirror so the
layout is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each column (col i owns bit
    lane i, i+n, i+2n, ...). Inputs must already be non-negative ints in
    [0, 2^bits); callers bucket/hash into that range first."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            key = key + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return key


def zorder_sql(exprs: Sequence[str], bits: int = 8) -> str:
    """The identical Morton code as a SQL expression string (DuckDB/ANSI
    shift operators) — the oracle mirror of :func:`zorder_key`."""
    n = len(exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            # full outer parens: SQL gives '+' tighter precedence than '<<',
            # so an unparenthesized 'x << 5 + y' is 'x << (5 + y)'
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    dims: Sequence[str],
    bits: int = 8,
    file_bits: int = 6,
) -> DataFrame:
    """(file_id, n, min/max per dim): the file manifest a z-ordered write
    would produce, with 2^file_bits files keyed by the code's top bits.

    One shuffle (the groupBy) over (file_id, dims) longs — the write itself
    would be ``repartitionByRange(zkey)``; this returns the statistics that
    prove the layout prunes."""
    total_bits = bits * len(dims)
    zk = zorder_key([F.col(d) for d in dims], bits=bits)
    tagged = df.select(
        *dims, F.shiftright(zk, total_bits - file_bits).alias("file_id")
    )
    aggs = [F.count("*").alias("n")]
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return tagged.groupBy("file_id").agg(*aggs)


def compaction_plan(
    manifest: DataFrame,
    target_rows: int,
    order_col: str = "file_id",
    size_col: str = "n",
) -> DataFrame:
    """Small-file compaction planner — the table-maintenance step an
    Iceberg/lakehouse pipeline schedules: walk the file manifest in
    layout order (preserving the z-order clustering) and pack
    consecutive files into groups of ~``target_rows`` via the running
    size sum (group = floor(exclusive-prefix-sum / target), the
    bin-by-running-total plan). Rewriting each group as one file yields
    right-sized, still-clustered files.

    The window runs over the FILE MANIFEST — thousands of rows per
    partition at most, never data — so the single-partition frame is a
    driver-sized cost, same contract as the domain mixers.

    Output: (group_id, n_files, n_rows, first_file, last_file,
    undersized) — undersized marks the (at most one, trailing) group
    below target.
    """
    from pyspark.sql import Window

    wo = Window.orderBy(order_col)
    cum_before = F.coalesce(
        F.sum(size_col).over(wo.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    tagged = manifest.withColumn(
        "group_id", F.floor(cum_before / F.lit(int(target_rows))).cast("int")
    )
    return (
        tagged.groupBy("group_id")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(size_col).cast("bigint").alias("n_rows"),
            F.min(order_col).cast("bigint").alias("first_file"),
            F.max(order_col).cast("bigint").alias("last_file"),
        )
        .select(
            "group_id",
            "n_files",
            "n_rows",
            "first_file",
            "last_file",
            (F.col("n_rows") < F.lit(int(target_rows))).alias("undersized"),
        )
    )
