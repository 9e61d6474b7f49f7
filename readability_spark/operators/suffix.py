"""Distributed suffix-array construction by prefix doubling — the exact
building block behind ExactSubstr dedup (Lee et al. 2022 build a suffix
array to find all duplicated spans; `operators/spans.py` is the
60-bit-hash windowed approximation, this is the exact structure).

:func:`suffix_ranks` assigns every (doc, position) suffix its global
lexicographic *dense* rank over the whole corpus (identical suffixes share
a rank; suffixes end at document boundaries, the corpus-dedup convention).

:func:`exact_duplicate_spans` is the application: maximal runs of
duplicated fixed-length token windows, keyed by TRUE content equality via
doubling ranks (rank(prefix 2^j) at p and at p + L - 2^j together certify
the whole L-window, the classic suffix-array substring-comparison trick) —
no hash, so no birthday collisions at any corpus size, unlike the
windowed formulation it mirrors.

Algorithm (Manber–Myers prefix doubling, distributed):

1. round 0: rank each position by its single token — a global dense rank;
2. round k: pair every position's rank with the rank 2^k positions ahead
   in the same document (``lead`` over the per-doc window; 0 past the end,
   which sorts before every real rank, so a short suffix orders before any
   suffix it prefixes — exactly string order); dense-rank the pairs;
3. stop after ceil(log2(max doc length)) rounds — ranks are then the full
   suffix ranks.

Scale shape: each round is ONE per-doc window (lead — the shuffle is on
doc_id, partitions bounded by document length) plus ONE global dense rank,
which `ordering.dense_rank_global` computes with range partitioning — no
single-task sort anywhere. Rounds are log(max doc length), lineage is cut
per round with ``localCheckpoint``. All comparisons are on longs: token
text leaves the plan after round 0.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from readability_spark.operators.ordering import dense_rank_global


def _position_token_ranks(
    docs: DataFrame, id_col: str, text_col: str, n_parts: int
) -> DataFrame:
    """(_d, p, rank): every token position, ranked by its single token."""
    pos = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p", "_w"),
    )
    return (
        dense_rank_global(pos, ["_w"], out="rank", n_parts=n_parts)
        .select("_d", "p", "rank")
        .localCheckpoint(eager=False)
    )


def _dense_rank_bounded(
    paired: DataFrame, mx: int, n_parts: int
) -> DataFrame:
    """dense_rank over (rank, _r2) when ``rank`` is a dense integer in
    [1, mx] — the doubling-loop case. The bucket is pure arithmetic
    (``floor(rank * n_parts / (mx+1))``), so unlike
    ``ordering.dense_rank_global`` there is NO range-partitioner sampling
    pass over the data each round; equal keys still colocate (the bucket
    depends only on rank) and bucket ids are monotone in key order, so
    the broadcast prefix-offset shift reproduces the global dense rank
    bit-for-bit. The bucketed table is checkpointed lazily: the counts
    aggregate materializes it and the window branch + join read it back."""
    b = (
        F.least(
            F.lit(n_parts - 1),
            F.floor(F.col("rank") * F.lit(n_parts) / F.lit(mx + 1)),
        )
        .cast("int")
        .alias("_bk")
    )
    bucketed = paired.select("*", b).localCheckpoint(eager=False)
    local = F.dense_rank().over(
        Window.partitionBy("_bk").orderBy("rank", "_r2")
    )
    counts = bucketed.groupBy("_bk").agg(
        F.countDistinct("rank", "_r2").alias("_n")
    )
    offsets = counts.select(
        "_bk",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        bucketed.withColumn("_lrk", local)
        .join(F.broadcast(offsets), "_bk")
        .select("_d", "p", (F.col("_off") + F.col("_lrk")).cast("long").alias("rank"))
    )


def _double_ranks(
    r: DataFrame, rounds: int, n_parts: int, stable_exit: bool = False
) -> DataFrame:
    """Prefix-double up to ``rounds`` times: rank of prefix length 2^rounds.

    Early exits (Manber–Myers), probed with one scan of the round's
    checkpointed (long, long, long) table that doubles as its
    materializing action:

    - uniqueness: once every position's rank is unique (max rank ==
      position count), doubling is the identity — the dense rank of
      (rank, _r2) with unique first keys reproduces rank — so the
      returned ranks equal the full ``rounds``-round ranks. Always safe.
    - stagnation (``stable_exit``): if a round does not increase the
      number of distinct ranks, no later round can (rank_{2k} classes are
      functions of rank_k classes, so a stable partition is the limit
      partition) — the ranks already equal the FULL suffix ranks. Safe
      for :func:`suffix_ranks` (whose target is the limit), NOT for
      :func:`exact_duplicate_spans`, whose window certificates need the
      rank of EXACTLY the 2^rounds-token prefix: the limit partition is
      strictly finer when equal windows sit inside diverging suffixes,
      and finer ranks would miss those duplicate windows.
    """
    k = 1
    # bound for the arithmetic bucketer; also materializes r's checkpoint
    prev_mx = r.agg(F.max("rank")).first()[0]
    if prev_mx is None:
        return r
    for _ in range(rounds):
        w = Window.partitionBy("_d").orderBy("p")
        paired = r.select(
            "_d", "p", "rank", F.lead("rank", k, 0).over(w).alias("_r2")
        )
        r = _dense_rank_bounded(paired, prev_mx, n_parts).localCheckpoint(
            eager=False
        )
        k *= 2
        mx, n = r.agg(F.max("rank"), F.count("*")).first()
        if mx == n or (stable_exit and mx == prev_mx):
            break
        prev_mx = mx
    return r


def suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
) -> DataFrame:
    """(id, p, rank): the global dense lexicographic rank of every
    token-level suffix ``tokens[p:]`` (0-based p), ties shared."""
    pos = _position_token_ranks(docs, id_col, text_col, n_parts)

    maxlen = pos.agg(F.max("p")).first()[0]
    if maxlen is None:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, p int, rank long"
        )
    rounds = max(0, math.ceil(math.log2(maxlen + 1)))
    r = _double_ranks(pos, rounds, n_parts, stable_exit=True)
    return r.select(F.col("_d").alias(id_col), "p", "rank")


def exact_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 8,
    min_count: int = 2,
    n_parts: int = 64,
) -> DataFrame:
    """Maximal runs of ``length``-token windows whose content appears >=
    ``min_count`` times corpus-wide — exact (rank-certified, hash-free).

    Window identity: with k the largest power of two <= length,
    tokens[p : p+length] == tokens[q : q+length]  ⟺
    rank_k[p] == rank_k[q] AND rank_k[p+length-k] == rank_k[q+length-k]
    (the two k-prefixes overlap-cover the window since 2k >= length).

    Returns ``(doc_id, span_start, span_end, n_dup_windows)``, 0-based,
    span_end inclusive — same contract as spans.duplicate_ngram_spans.
    """
    rounds = max(0, int(math.floor(math.log2(length))))
    k = 1 << rounds
    pos = _position_token_ranks(docs, id_col, text_col, n_parts)
    r = _double_ranks(pos, rounds, n_parts)

    w = Window.partitionBy("_d").orderBy("p")
    r2 = (
        F.col("rank")
        if length == k
        else F.lead("rank", length - k, 0).over(w)
    )
    keyed = (
        r.withColumn("_r2", r2)
        .withColumn("_len", F.count("*").over(Window.partitionBy("_d")))
        .where(F.col("p") + length <= F.col("_len"))
        .select("_d", "p", "rank", "_r2")
    ).localCheckpoint(eager=False)

    dup = (
        keyed.groupBy("rank", "_r2")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("rank", "_r2")
    )
    marked = keyed.join(dup, ["rank", "_r2"], "left_semi")
    isl = marked.withColumn(
        "isl",
        F.col("p") - F.row_number().over(Window.partitionBy("_d").orderBy("p")),
    )
    return (
        isl.groupBy("_d", "isl")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + F.lit(length - 1)).cast("long").alias("span_end"),
            F.count("*").alias("n_dup_windows"),
        )
        .select(F.col("_d").alias(id_col), "span_start", "span_end", "n_dup_windows")
    )
