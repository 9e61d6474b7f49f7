"""Collocation mining and positional phrase search over tokenized text —
the phrase-vocabulary / quote-lookup layer of a training-data pipeline.

- :func:`pmi_bigrams` — pointwise mutual information of adjacent token
  pairs (Church & Hanks 1990), the standard phrase-mining signal. Bigram
  extraction is a pure codegen ``transform`` over the token array (no
  posexplode self-join, no Python); the heavy shuffle is ONE groupBy over
  (a, b) carrying only the two tokens; unigram counts are a second, strictly
  smaller groupBy whose result is broadcast back twice. Corpus totals ride
  along as broadcast scalars. At 10^12 documents the (a, b) key space is
  vocabulary², not corpus-sized — the aggregation is map-side-combined and
  the output is bounded by ``min_count``.

- :func:`phrase_search` — exact consecutive-phrase lookup via positional
  postings, the inverted-index primitive BM25 doesn't cover. Postings are
  filtered to the phrase's own terms BEFORE the shuffle (the same
  prune-early discipline as lexsearch), so the join keyed on
  (doc, position+1) only ever carries rows for the queried terms — the
  corpus-size-independent cost profile a 100 TB index needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """One row per adjacent token pair, via a codegen array transform."""
    return (
        docs.select(F.split(F.col(text_col), " ").alias("_t"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(_t, 1, greatest(size(_t) - 1, 0)),"
                    " (x, i) -> struct(x AS a, _t[i + 1] AS b))"
                )
            ).alias("_bg")
        )
        .select(F.col("_bg.a").alias("a"), F.col("_bg.b").alias("b"))
    )


def pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(a, b, n_ab, pmi) for every adjacent bigram with count >= min_count.

    pmi = ln( (n_ab / N) / ((n_a / M) * (n_b / M)) ) with N = total bigram
    occurrences and M = total token occurrences — the textbook estimator,
    exactly mirrorable in SQL.
    """
    bg = _bigrams(docs, text_col)
    n_ab = bg.groupBy("a", "b").agg(F.count("*").alias("n_ab"))

    uni = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    totals = n_ab.agg(F.sum("n_ab").alias("N")).crossJoin(
        uni.agg(F.sum("n_w").alias("M"))
    )

    out = (
        n_ab.where(F.col("n_ab") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("w", "a").withColumnRenamed("n_w", "n_a")), "a")
        .join(F.broadcast(uni.withColumnRenamed("w", "b").withColumnRenamed("n_w", "n_b")), "b")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_ab") / F.col("N"))
        / ((F.col("n_a") / F.col("M")) * (F.col("n_b") / F.col("M")))
    )
    return out.select("a", "b", "n_ab", pmi.alias("pmi"))


def phrase_search(
    docs: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits) for every document containing ``phrase`` as consecutive
    tokens, via positional postings pruned to the phrase's terms.

    Only 2-term phrases need one join; longer phrases chain — each join is
    keyed on (doc, pos) and carries rows for ONE term per side.
    """
    terms = list(phrase)
    if len(terms) < 2:
        raise ValueError("phrase_search needs at least two terms")

    postings = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("_p", "_w"),
        )
        .where(F.col("_w").isin(terms))
    )

    cur = postings.where(F.col("_w") == terms[0]).select("_d", F.col("_p").alias("_p0"))
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.where(F.col("_w") == t).select(
            F.col("_d").alias("_d2"), (F.col("_p") - i).alias("_p2")
        )
        cur = cur.join(
            nxt,
            (F.col("_d") == F.col("_d2")) & (F.col("_p0") == F.col("_p2")),
        ).select("_d", "_p0")

    return cur.groupBy(F.col("_d").alias(id_col)).agg(F.count("*").alias("n_hits"))
