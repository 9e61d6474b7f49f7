"""Deterministic global training order without a global sort.

A training run wants every document assigned a contiguous, seeded,
shuffled index 0..n-1 (data ordering is part of the training recipe and
must be reproducible). ``row_number() OVER (ORDER BY hash)`` is the
obvious spelling but its unpartitioned window funnels the whole corpus
through ONE task — the classic scale-killer.

:func:`global_shuffle_index` computes the identical assignment in two
parallel phases (the same distributed prefix-sum shape as
``corpus_sequence_pack``):

1. every row gets a seeded md5 sort key; its first byte pair buckets the
   corpus into 256 hash ranges; a 256-row count table (one tiny agg) is
   turned into exclusive prefix offsets by a window over THAT table only;
2. rows are ranked *within* their bucket (256 parallel window partitions,
   each ~n/256 rows) and shifted by the broadcast bucket offset.

Because md5 is uniform, bucket sizes are balanced within ~sqrt; no task
ever sorts more than its bucket. The result is bit-identical to the
single-task global window at any partitioning, which is what the oracle
asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_rank_global(
    df: DataFrame,
    keys: list,
    out: str = "_rank",
    n_parts: int = 64,
) -> DataFrame:
    """Global ``dense_rank() OVER (ORDER BY keys)`` without the single-task
    window: range-partition on the keys (equal keys never straddle a range
    boundary), dense-rank inside each partition in parallel, then shift by
    the broadcast running sum of per-partition distinct-key counts.

    Bit-identical to the naive global window at any partitioning; the only
    SinglePartition exchange is over the ``n_parts``-row counts table.
    """
    # the ranked branch AND the counts branch both read this subtree; the
    # range exchange samples boundaries and _pid reads the physical
    # partition id, so re-evaluating it per branch could disagree —
    # checkpoint so both branches see ONE materialization
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(k) for k in keys])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = F.dense_rank().over(
        Window.partitionBy("_pid").orderBy(*[F.col(k) for k in keys])
    )
    counts = ranged.groupBy("_pid").agg(
        F.countDistinct(*[F.col(k) for k in keys]).alias("_n")
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        ranged.withColumn("_lrk", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lrk")).cast("long"))
        .drop("_pid", "_lrk", "_off")
    )


def global_shuffle_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """(id, shuffle_idx): a seeded permutation of 0..n-1, no global sort.

    The sort key is md5(seed || id) — unique as long as ids are unique, so
    the permutation is total and deterministic across partitionings.
    """
    keyed = docs.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))).alias("_key"),
    ).withColumn("_bucket", F.conv(F.substring("_key", 1, 2), 16, 10).cast("int"))

    counts = keyed.groupBy("_bucket").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "_bucket",
        (
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("_off"),
    )

    ranked = keyed.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("_bucket").orderBy("_key")) - 1,
    )
    return ranked.join(F.broadcast(offsets), "_bucket").select(
        id_col, (F.col("_off") + F.col("_rk")).cast("long").alias("shuffle_idx")
    )


def curriculum_order(
    df: DataFrame,
    domain_col: str = "domain",
    quality_col: str = "quality",
    id_col: str = "doc_id",
    n_parts: int = 64,
) -> DataFrame:
    """Quality-descending, domain-interleaved global training order: every
    domain ranks its own documents best-first, then rank-r documents of ALL
    domains precede every rank-r+1 document (round-robin curriculum — early
    training sees the best of each domain instead of draining the largest
    domain first; the data-ordering half of curriculum learning, Bengio et
    al. 2009, composed with mixture interleaving).

    Two parallel phases, no single-task sort: a per-domain ``row_number``
    window (each domain ranks only its own rows), then
    :func:`dense_rank_global` over (rank, domain, id) — the key triple is
    unique, so the global dense rank IS the contiguous 0-based position,
    computed with the same 2-phase offset shift as
    :func:`global_shuffle_index`. ``quality`` is expected pre-rounded
    (1e-4) so float ulps can't flip a rank across engines.

    Output: (id, domain, quality, domain_rank, position).
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    ranked = df.withColumn("domain_rank", F.row_number().over(w))
    out = dense_rank_global(
        ranked, ["domain_rank", domain_col, id_col], out="position", n_parts=n_parts
    )
    return out.select(
        id_col,
        domain_col,
        quality_col,
        F.col("domain_rank").cast("bigint").alias("domain_rank"),
        (F.col("position") - 1).cast("bigint").alias("position"),
    )
