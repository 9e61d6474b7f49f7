"""Distributed suffix-array construction by prefix doubling — the exact
building block behind ExactSubstr dedup (Lee et al. 2022 build a suffix
array to find all duplicated spans; `operators/spans.py` is the windowed
approximation, this is the exact structure).

:func:`suffix_ranks` assigns every (doc, position) suffix its global
lexicographic *dense* rank over the whole corpus (identical suffixes share
a rank; suffixes end at document boundaries, the corpus-dedup convention).

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


def suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
) -> DataFrame:
    """(id, p, rank): the global dense lexicographic rank of every
    token-level suffix ``tokens[p:]`` (0-based p), ties shared."""
    pos = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p", "_w"),
    )

    maxlen = pos.agg(F.max("p")).first()[0]
    if maxlen is None:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, p int, rank long"
        )
    rounds = max(0, math.ceil(math.log2(maxlen + 1)))

    r = dense_rank_global(pos, ["_w"], out="rank", n_parts=n_parts).select(
        "_d", "p", "rank"
    ).localCheckpoint(eager=False)

    k = 1
    for _ in range(rounds):
        w = Window.partitionBy("_d").orderBy("p")
        paired = r.select(
            "_d",
            "p",
            "rank",
            F.lead("rank", k, 0).over(w).alias("_r2"),
        )
        r = dense_rank_global(paired, ["rank", "_r2"], out="_nr", n_parts=n_parts).select(
            "_d", "p", F.col("_nr").alias("rank")
        ).localCheckpoint(eager=False)
        k *= 2

    return r.select(F.col("_d").alias(id_col), "p", "rank")
