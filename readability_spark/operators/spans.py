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


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
# local document fingerprinting algorithm)
# ---------------------------------------------------------------------------

WINNOW_K = 3   # token k-gram size
WINNOW_W = 4   # window of consecutive k-gram hashes


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing document fingerprints: from each window of ``w``
    consecutive k-gram hashes select the minimum (rightmost position on
    ties — the paper's rule), dedup the selections. Guarantees at least
    one shared fingerprint for any match of length >= w + k - 1, with
    density 2/(w+1) — the local fingerprinting property MOSS uses for
    plagiarism/overlap detection at corpus scale.

    Engine-portable encoding: the k-gram hash is the first 10 hex digits
    of md5 (40 bits); the window key packs (hash, position-complement)
    into ONE bigint ``h·2^20 + (2^20−1−pos)`` so a plain ``array_min``
    implements "min hash, rightmost on ties" exactly — no struct
    comparisons, same arithmetic in the DuckDB oracle (positions are
    bounded by the doc's own token count; 40+20 bits < 63).

    Plan shape: everything happens inside per-row array expressions
    (sequence/transform/slice/array_min — whole-stage codegen, zero
    Python, zero shuffles before the final explode). Cost is O(n·w) per
    doc with w a small constant.

    Output: (doc_id, pos, fp) — one row per selected fingerprint.
    """
    toks = F.split(F.col("text"), " ")
    n_grams = F.size(toks) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    base = docs.filter(n_grams >= w).select(
        "doc_id",
        grams.alias("_grams"),
    )
    keyed = base.select(
        "doc_id",
        F.expr(
            "transform(_grams, (g, i) -> "
            "cast(conv(substr(md5(g), 1, 10), 16, 10) as bigint) * 1048576 "
            "+ (1048575 - i))"
        ).alias("_keys"),
    )
    # A lambda's outer reference to a COMPUTED column is re-evaluated per
    # element (higher-order functions don't subexpression-eliminate across
    # the lambda boundary): without a barrier the whole md5 key array is
    # rebuilt for every window — O(n²) hashes per doc (measured 11.8s vs
    # 0.55s at sf0.01). The lazy local checkpoint materializes the keys
    # once so the window lambda reads an attribute, not an expression.
    keyed = keyed.localCheckpoint(eager=False)
    mins = keyed.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform(sequence(0, size(_keys) - {w}), "
            f"s -> array_min(slice(_keys, s + 1, {w}))))"
        ).alias("_fps"),
    )
    out = mins.select("doc_id", F.explode("_fps").alias("_key"))
    return out.select(
        "doc_id",
        (F.lit(1048575) - (F.col("_key") % 1048576)).cast("int").alias("pos"),
        F.expr("shiftright(_key, 20)").alias("fp"),
    )


def winnow_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    max_fp_df: int = 100,
) -> DataFrame:
    """Cross-document overlap candidates from shared winnowing fingerprints
    — the MOSS pipeline's second half. Two docs sharing any substring of
    >= w + k - 1 tokens share a fingerprint BY the winnowing guarantee, so
    pairs with ``n_shared >= min_shared`` fingerprints are overlap
    candidates with a quantified score.

    Skew discipline (same as the n-gram DF cap): a fingerprint held by
    thousands of docs is boilerplate and would go quadratic in the
    self-join — fingerprints with document frequency outside
    [2, max_fp_df] are dropped before the join, so every surviving join
    key fans out at most max_fp_df ways.

    Output: (id_a, id_b, n_shared, overlap) with
    overlap = n_shared / min(|fps_a|, |fps_b|) — containment-style, so a
    short doc fully covered by a long one scores ~1.0.
    """
    fps = winnow_fingerprints(docs).select("doc_id", "fp").distinct()
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n_fps"))
    dfreq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    keep = dfreq.filter((F.col("df") >= 2) & (F.col("df") <= max_fp_df)).select("fp")
    pruned = fps.join(keep, "fp")
    a, b = pruned.alias("a"), pruned.alias("b")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    from readability_spark.operators.dedup import round4

    return (
        shared.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fps").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fps").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("int").alias("n_shared"),
            round4(F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))).alias("overlap"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    length: int = 6,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup with REMOVAL (Lee et al. 2022 §4: they cut all
    but one occurrence of each duplicated substring, not just report it):
    every ``length``-token window whose content appears >= ``min_count``
    times corpus-wide keeps exactly its first occurrence — the smallest
    (doc_id, p) — and every token covered by any OTHER occurrence is cut;
    the survivors reassemble into ``text_clean``.

    Overlap semantics (documented, deterministic): a token is removed iff
    at least one non-survivor duplicated window covers it — so a token
    inside a kept window can still be cut by a different overlapping
    removed window, exactly like span-merge in the reference
    formulation. Every input doc appears in the output (fully-removed
    docs with ``text_clean = ''``).

    Scale shape: window keys are md5(window) so the corpus-wide count
    shuffles 32-byte keys (THE ExactSubstr exchange — one groupBy with
    map-side combine); survivor election is a struct-min inside the same
    aggregate, no window function; removed positions are bounded by
    ``length`` x duplicated occurrences; the anti-join and the per-doc
    reassembly key on (doc_id, pos) / doc_id. Per-doc collect_list is
    bounded by document length, the same inherent bound every per-doc
    reassembly has.

    Output: (doc_id, text_clean, n_tokens_kept, n_tokens_removed).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    ).localCheckpoint(eager=False)  # feeds windows, tokens, and totals
    win = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.when(
                        F.size("t") >= F.lit(length),
                        F.sequence(F.lit(0), F.size("t") - length),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.struct(
                        i.alias("p"),
                        F.md5(F.concat_ws(" ", F.slice("t", i + 1, length))).alias(
                            "wk"
                        ),
                    ),
                )
            ).alias("w"),
        ).select("doc_id", F.col("w.p").alias("p"), F.col("w.wk").alias("wk"))
    ).localCheckpoint(eager=False)  # feeds the count agg and the rejoin
    stats = win.groupBy("wk").agg(
        F.count("*").alias("n"),
        F.min(F.struct(F.col("doc_id"), F.col("p"))).alias("keep"),
    )
    removed_occ = (
        win.join(stats.filter(F.col("n") >= min_count), "wk")
        .filter(
            ~(
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("p") == F.col("keep.p"))
            )
        )
        .select("doc_id", "p")
    )
    removed_pos = removed_occ.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + (length - 1))).alias("pos")
    )
    tok = toks.select("doc_id", F.posexplode("t").alias("pos", "tk"))
    kept = tok.join(removed_pos, ["doc_id", "pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tk"))), lambda s: s.tk
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_tokens_kept"),
    )
    totals = toks.select("doc_id", F.size("t").alias("_n_tokens"))
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("bigint").alias("n_tokens_kept"),
        (F.col("_n_tokens") - F.coalesce(F.col("n_tokens_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_tokens_removed"),
    )
