"""Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

Tokenizer training is the step a web-scale corpus pipeline runs right after
cleaning/dedup and right before packing: learn the byte-pair-encoding merge
table from the corpus itself. This module implements the merge-learning
loop as pure DataFrame algebra — no Python in the loop body, no driver-side
corpus state.

The classic scaling trick (also in the reference BPE implementation and in
SentencePiece): BPE statistics are a function of the **distinct-word
frequency table**, not the corpus. A 100 TB corpus has maybe 10^8 distinct
alphabetic words; the iteration runs over that table, so corpus size only
affects the one up-front word-count aggregation (map-side combined, one
shuffle on the word).

Representation: a word's current segmentation is a single delimited string
``␞t1␞␞t2␞…␞tk␞`` (``␞`` = U+001E record separator, one on each side of
every token). Applying merge ``(a, b)`` is then one literal
``replace(repr, '␞a␞␞b␞', '␞ab␞')`` — Spark's (and ANSI SQL's) replace
scans left-to-right over non-overlapping occurrences, which is exactly the
BPE merge rule, and adjacent occurrences share no delimiter characters so
``…␞a␞␞b␞␞a␞␞b␞…`` collapses to ``…␞ab␞␞ab␞…`` in one pass. This keeps
re-segmentation a codegen projection instead of a per-row Python loop.

Per merge round:

1. pair counting — explode each word's adjacent token pairs, ``groupBy(a,
   b).sum(cnt)`` (the round's only shuffle, map-side combined);
2. winner election — a global ``max(struct(count, a, b))`` aggregate
   (deterministic tie-break: highest count, then lexicographically largest
   pair), reduced to one row without collecting anything to the driver;
3. re-segmentation — broadcast the 1-row winner, ``replace`` projection.

Lineage is truncated every round with ``localCheckpoint(eager=False)``
(the same pattern as ``operators/graph.py``'s PageRank loop) so the plan
does not nest ``num_merges`` replace chains.

Oracle: the identical algebra unrolls into ``num_merges`` DuckDB CTE
blocks (see ``__spark_entry__._bpe_vocab_oracle``) — every step above is
engine-portable SQL, so the merge table is exactly checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Token delimiter (U+001E RECORD SEPARATOR) — cannot appear in [a-z]+ words.
SEP = ""


def word_counts(docs: DataFrame) -> DataFrame:
    """Distinct-word frequency table: lowercase ``text`` split on non-letter
    runs. The single corpus-sized aggregation; everything after runs over
    its (small) output."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_repr(words: DataFrame) -> DataFrame:
    # one character per token: every char wrapped as ␞c␞
    return words.select(
        F.regexp_replace("word", "(.)", f"{SEP}$1{SEP}").alias("repr"),
        "cnt",
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    toks = F.split(F.btrim(F.col("repr"), F.lit(SEP)), SEP + SEP)
    n = F.size(toks)
    # guard: F.sequence(1, 0) would generate a DESCENDING [1, 0] — single-token
    # words must contribute an empty pair list instead.
    idx = F.when(n > 1, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        )
    ).alias("p")
    return words.select(pair, "cnt").select("p.a", "p.b", "cnt")


def bpe_vocab(docs: DataFrame, num_merges: int = 8) -> DataFrame:
    """Learn ``num_merges`` BPE merges from ``(doc_id, text)`` docs.

    Returns the merge table — one row per round:
    ``round int, left_tok string, right_tok string, merge_count bigint`` —
    i.e. exactly what a tokenizer ships as ``merges.txt``.

    Assumes the corpus yields at least ``num_merges`` mergeable pairs (a
    corpus of only single-letter words would exhaust earlier; rounds past
    exhaustion produce no row rather than failing).
    """
    words = _initial_repr(word_counts(docs)).localCheckpoint(eager=False)
    merges: list[DataFrame] = []
    for r in range(1, num_merges + 1):
        pc = _adjacent_pairs(words).groupBy("a", "b").agg(F.sum("cnt").alias("c"))
        winner = (
            pc.agg(F.max(F.struct(F.col("c"), F.col("a"), F.col("b"))).alias("w"))
            .select(F.col("w.c").alias("c"), F.col("w.a").alias("a"), F.col("w.b").alias("b"))
            .filter(F.col("c").isNotNull())
            .localCheckpoint(eager=False)
        )
        merges.append(
            winner.select(
                F.lit(r).alias("round"),
                F.col("a").alias("left_tok"),
                F.col("b").alias("right_tok"),
                F.col("c").cast("long").alias("merge_count"),
            )
        )
        pat = F.concat(F.lit(SEP), F.col("a"), F.lit(SEP + SEP), F.col("b"), F.lit(SEP))
        rep = F.concat(F.lit(SEP), F.col("a"), F.col("b"), F.lit(SEP))
        words = (
            words.crossJoin(F.broadcast(winner))
            .select(F.replace(F.col("repr"), pat, rep).alias("repr"), "cnt")
            .localCheckpoint(eager=False)
        )
    return reduce(DataFrame.unionByName, merges)


def bpe_segment(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply a learned merge table to segment ``text`` — returns
    ``doc_id, tokens array<string>, n_tokens``. The merge table is tiny
    (thousands of rows) so it is collected once and folded into a chain of
    ``replace`` projections; the corpus never shuffles."""
    rows = sorted(merges.collect(), key=lambda x: x["round"])
    repr_col = F.regexp_replace(F.lower(F.col("text")), "([a-z])", f"{SEP}$1{SEP}")
    repr_col = F.regexp_replace(repr_col, f"[^a-z{SEP}]+", " ")
    for m in rows:
        repr_col = F.replace(
            repr_col,
            F.lit(f"{SEP}{m['left_tok']}{SEP}{SEP}{m['right_tok']}{SEP}"),
            F.lit(f"{SEP}{m['left_tok']}{m['right_tok']}{SEP}"),
        )
    toks = F.filter(
        F.split(repr_col, f"[{SEP} ]+"), lambda t: t != F.lit("")
    )
    return docs.select(
        "doc_id", toks.alias("tokens"), F.size(toks).cast("long").alias("n_tokens")
    )


def bpe_fertility(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility report — the metric a tokenizer
    choice is judged by (e.g. XLM-R/UniMax papers): subword tokens per
    whitespace word and characters per subword token, aggregated per
    language. High fertility means the vocabulary under-serves the
    language (each word shatters into many pieces) and that language
    effectively pays more sequence budget per sentence.

    Scale shape: :func:`bpe_segment` is a shuffle-free projection chain;
    this adds one map-side-combined groupBy(lang) over three longs.

    Output: (lang, n_docs, n_words, n_bpe_tokens, n_chars, fertility,
    chars_per_token) — ratios round4.
    """
    from readability_spark.operators.dedup import round4

    seg = bpe_segment(docs, merges).select("doc_id", "n_tokens")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
    )
    per = base.join(seg, "doc_id").groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        round4(F.col("n_bpe_tokens") / F.col("n_words")).alias("fertility"),
        round4(F.col("n_chars") / F.col("n_bpe_tokens")).alias("chars_per_token"),
    )
