"""ExactSubstr-style duplicate span detection (Lee et al. 2022,
arXiv:2107.06499, "Deduplicating Training Data Makes Language Models
Better").

The paper removes every substring of >= 50 tokens that appears verbatim
more than once in the corpus, found with a suffix array. A suffix array is
a single-machine structure; the standard distributed equivalent (used by
this operator) is the sliding-window formulation: hash every k-token
window at stride 1, mark the window positions whose hash occurs >=
``min_count`` times corpus-wide (including within-document repeats, as the
paper does), and merge runs of adjacent duplicated positions into maximal
spans — a window-k approximation that finds exactly the duplicated
substrings of length >= k, reported as their maximal extents.

Returns one row per maximal duplicated span:
``(doc_id, span_start, span_end, n_dup_windows)`` with 0-based token
indices, ``span_end`` inclusive.

Scale shape (the paper's C4 = 360 GB; this targets 100 TB):
- windowing is a projection + posexplode — rows = corpus token count,
  each carrying (long doc_id, int pos, long hash64): no text in flight;
- the duplicated-hash set is one map-side-combined ``groupBy(h)`` (hot
  boilerplate windows collapse per partition before the shuffle);
- marking is a semi join on the hash — Spark/AQE broadcasts it when the
  dup set is small, falls back to a shuffled hash join when it is not;
- span merging is the classic gaps-and-islands: one per-doc window over
  only the *marked* positions (a small fraction of the corpus after
  filtering).

Hashes are the first 60 md5 bits (15 hex nibbles — fits a signed int64
exactly, same trick as the streaming fp2), so the DuckDB oracle reproduces
them bit-for-bit; at 10^12 windows the 60-bit birthday collision count is
~10^6 windows (one per million) — each would merely extend a span by one
false window, an accepted approximation documented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def duplicate_ngram_spans(
    docs: DataFrame, k: int = 8, min_count: int = 2
) -> DataFrame:
    """Find maximal spans of k-token windows duplicated >= min_count times
    corpus-wide over ``(doc_id, text)``."""
    h = (
        f"cast(conv(substr(md5(concat_ws(' ', slice(toks, i + 1, {k}))), 1, 15),"
        f" 16, 10) as bigint)"
    )
    w = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.expr(f"size(toks) >= {k}"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(f"transform(sequence(0, size(toks) - {k}), i -> {h})")
            ).alias("pos", "h"),
        )
    )
    dup = (
        w.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    marked = w.join(dup, "h", "left_semi")
    isl = marked.withColumn(
        "isl",
        F.col("pos") - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count("*").alias("n_dup_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_dup_windows")
    )
