"""Content-defined chunking (CDC) — shift-robust chunk-level dedup.

Fixed-window chunk dedup (operators/decontam.chunk_dedup) breaks when one
character is inserted: every downstream chunk boundary shifts and nothing
matches. CDC (the rsync/LBFS/storage-dedup trick) derives boundaries from
the CONTENT — a position ends a chunk when the hash of the trailing
w-char window lands in a target set — so an edit only perturbs the chunks
it touches and identical passages re-align no matter where they sit in
the document. For a training corpus this catches shifted boilerplate and
quoted/syndicated passages that fixed chunking misses.

Boundary rule (deterministic, SQL-mirrorable): position i (1-based) ends
a chunk iff ``md5(substr(text, i-w+1, w))`` ends in '0' (p = 1/16 →
expected chunk ≈ 16 + w chars with this corpus's short docs; production
would widen the mask to '00' for ~256-char chunks — one constant).

Scale shape: boundary detection and chunk slicing are higher-order
column expressions over each doc's own text — zero Python, zero shuffle,
O(len·w) md5 work embarrassingly parallel on the scan; the dedup is one
explode + map-side-combined groupBy on the 16-byte chunk fingerprint.
Nothing longer than a chunk string ever shuffles, and the fingerprint
table supports the same incremental/bloom patterns as exact dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_chunks_col(text: Column, window: int = 8, max_chars: int = 2000) -> Column:
    """text → array<string> of content-defined chunks (covering the first
    ``max_chars`` chars exactly: concat(chunks) == substr(text, 1, max)).

    Single self-contained expression tree, but the boundary array is bound
    ONCE via one enclosing higher-order function (a 1-element transform)
    so Catalyst cannot re-inline the O(len) md5 scan per chunk — without
    the binding trick the slicing lambda references ``ends`` three times
    and the plan goes O(len²) in md5 calls (measured 31 s → 2 s at
    sf0.01)."""
    t = F.substring(text, 1, max_chars)
    length = F.length(t)
    idx = F.when(length >= window, F.sequence(F.lit(window), length)).otherwise(
        F.array().cast("array<int>")
    )
    bpos = F.filter(
        idx,
        lambda i: F.md5(F.substring(t, i - window + 1, F.lit(window))).endswith("0"),
    )
    ends = F.array_distinct(F.concat(bpos, F.array(length)))

    def slice_chunks(ends_bound: Column) -> Column:
        starts = F.concat(
            F.array(F.lit(0)),
            F.slice(ends_bound, 1, F.greatest(F.size(ends_bound) - 1, F.lit(0))),
        )
        return F.zip_with(
            starts, ends_bound, lambda s, e: F.substring(t, s + 1, e - s)
        )

    # bind `ends` to a lambda variable: evaluated once per row
    chunks = F.element_at(
        F.transform(F.array(ends), lambda eb: slice_chunks(eb)), 1
    )
    return F.when(length > 0, chunks).otherwise(F.array().cast("array<string>"))


def cdc_chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 8,
    max_chars: int = 2000,
    min_copies: int = 2,
) -> DataFrame:
    """documents → repeated content-defined chunks across the corpus:
    (chunk_fp, n_occurrences, n_docs, chunk_chars). Chunks whose md5
    appears ≥ ``min_copies`` times are the shift-robust duplicate mass
    (boilerplate, syndication, quotations)."""
    chunks = docs.select(
        "doc_id",
        F.explode(cdc_chunks_col(F.col(text_col), window, max_chars)).alias("chunk"),
    )
    return (
        chunks.select("doc_id", F.md5("chunk").alias("chunk_fp"), F.length("chunk").alias("cl"))
        .groupBy("chunk_fp")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("cl").cast("int").alias("chunk_chars"),
        )
        .filter(F.col("n_occurrences") >= min_copies)
    )
