"""Benchmark decontamination and chunk-level global dedup for training corpora.

Two standard passes a web-scale training-data pipeline runs after document
extraction and before tokenization:

- **Decontamination** (GPT-3 appendix-C style): remove or flag training
  documents that share word n-grams with an evaluation benchmark, so test
  answers are not memorized from the training set. The benchmark side is
  tiny (eval suites are at most millions of n-grams) while the corpus side
  is the full crawl — so the benchmark n-gram set is broadcast and the only
  shuffle is the per-document contamination count (map-side combined).

- **Chunk-level dedup** (CCNet-style paragraph dedup, over fixed-width
  token chunks since the synthetic corpus has no newlines): hash every
  chunk, keep each distinct chunk's globally-first occurrence (ordered by
  ``(doc_id, chunk_idx)``), drop the rest, and reassemble the surviving
  chunks per document. Boilerplate (navbars, cookie banners, footers) is
  exactly this: chunks repeated across millions of pages.

Scale notes (100 TB):
- decontaminate: corpus n-grams are exploded but never shuffled as strings —
  the broadcast-hash join against the benchmark set happens map-side, and
  only ``(doc_id, hit)`` longs reach the one aggregation shuffle.
- chunk_dedup: the keeper election is ``groupBy(chunk_hash).agg(min(...))``
  (map-side combined, skew-free even for a chunk repeated on every page —
  the same pattern that replaced the skewed window in ngram DF tagging),
  and the rejoin key is ``(hash, doc_id, idx)`` longs. Reassembly groups by
  doc_id, whose fan-in is bounded by chunks-per-doc, not corpus size.

No reference-repo counterpart: the reference (vborovikov/readability) is a
per-document extractor; these are the corpus-level companions the task brief
asks for alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4

# Benchmark membership and contamination-injection constants are literals so
# the DuckDB oracles in __spark_entry__ can mirror them exactly.
BENCH_MOD = 17
BENCH_REM = 3
INJECT_MOD = 10
INJECT_REM = 7
SNIPPET_DOC = BENCH_REM  # first benchmark doc (doc_id == 3)
SNIPPET_TOKENS = 10
KEEP_MAX_FRAC = 0.05


def _toks(col: str = "text"):
    return F.split(F.col(col), " ")


def _ngrams(col: str, n: int):
    toks = _toks(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def benchmark_split(docs: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Deterministically carve an eval 'benchmark' out of the corpus:
    doc_id % 17 == 3 is the benchmark, the rest is the training pool."""
    is_bench = F.col("doc_id") % BENCH_MOD == BENCH_REM
    return docs.filter(is_bench), docs.filter(~is_bench)


def with_injected_contamination(docs: DataFrame) -> DataFrame:
    """Append the first 10 tokens of benchmark doc 3 to every training doc
    with doc_id % 10 == 7 — a deterministic stand-in for the real-world
    leakage (quoted eval questions) decontamination exists to catch."""
    snippet = (
        docs.filter(F.col("doc_id") == SNIPPET_DOC)
        .select(
            F.concat_ws(" ", F.slice(_toks(), 1, SNIPPET_TOKENS)).alias("_snippet")
        )
    )
    tainted = (F.col("doc_id") % INJECT_MOD == INJECT_REM) & (
        F.col("doc_id") % BENCH_MOD != BENCH_REM
    )
    return docs.crossJoin(F.broadcast(snippet)).select(
        "doc_id",
        F.when(tainted, F.concat_ws(" ", F.col("text"), F.col("_snippet")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def decontaminate(docs: DataFrame, n: int = 5) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with the benchmark.

    Returns one row per training (non-benchmark) doc:
    ``doc_id, n_grams, n_contaminated, contamination_frac, keep`` where
    ``n_contaminated`` counts n-gram *positions* whose gram occurs anywhere
    in the benchmark, and ``keep`` is contamination_frac <= 0.05.
    """
    bench, train = benchmark_split(docs)
    bench_grams = (
        bench.select(F.explode(_ngrams("text", n)).alias("gram")).distinct()
    )
    positions = train.select(
        "doc_id", F.posexplode(_ngrams("text", n)).alias("idx", "gram")
    )
    hits = positions.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    frac = F.col("n_contaminated") / F.col("n_grams")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            round4(frac).alias("contamination_frac"),
            (frac <= KEEP_MAX_FRAC).alias("keep"),
        )
    )


def chunk_dedup(docs: DataFrame, chunk_tokens: int = 16) -> DataFrame:
    """Global keep-first dedup of fixed-width token chunks (CCNet-style).

    Every document is split into consecutive ``chunk_tokens``-token chunks
    (last chunk may be shorter). Each distinct chunk string survives only at
    its globally-first occurrence — minimum ``(doc_id, chunk_idx)`` — and the
    per-doc survivors are reassembled in order.

    Returns ``doc_id, n_chunks, n_kept, text_dedup`` for every input doc
    (``n_kept = 0`` and empty text when all chunks were duplicates).
    """
    toks = _toks()
    n_chunks = F.ceil(F.size(toks) / chunk_tokens).cast("int")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
                ),
            )
        ).alias("idx", "chunk"),
    ).withColumn("h", F.md5("chunk"))
    # Skew-free keeper election: min(struct) under groupBy is map-side
    # combined, so a chunk repeated on every page never funnels its posting
    # list through one task (unlike a window over partitionBy(h)).
    keepers = chunks.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("k")
    ).select("h", F.col("k.doc_id").alias("doc_id"), F.col("k.idx").alias("idx"))
    kept = chunks.join(keepers, ["h", "doc_id", "idx"], "left_semi")
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("text_dedup"),
    )
    return (
        docs.select("doc_id", n_chunks.cast("bigint").alias("n_chunks"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


#: Injected semantic-contamination id offset (mirrored in the oracle).
SEM_INJECT_OFFSET = 2_000_000
#: Cosine at or above this flags a training vector as benchmark leakage.
SEM_TAU = 0.9


def semantic_decontaminate(
    train: DataFrame, bench: DataFrame, tau: float = SEM_TAU
) -> DataFrame:
    """Embedding-level decontamination: flag training vectors whose cosine
    to ANY benchmark vector reaches ``tau`` — the semantic companion of
    the n-gram :func:`decontaminate` (paraphrased or re-templated eval
    questions share no exact n-grams but land next to the benchmark in
    embedding space; this is the embedding-dedup-for-decontamination pass
    described alongside SemDeDup-style curation).

    Inputs are embedding tables ``(vec_id, embedding)``. Returns one row
    per training vector: ``vec_id, nearest_bench_id, max_cosine, keep``
    (ties on the round4 cosine resolve to the smallest bench id, matching
    the SQL oracle's ``ORDER BY cosine DESC, bench_id``).

    Scale shape (100 TB): eval suites are at most ~10^5 vectors, so the
    benchmark side is broadcast and scored map-side against one scan of
    the corpus; the only shuffle carries one (cosine, bench_id) struct per
    training vector into a map-side-combined max. Cost is |bench| dot
    products per corpus row — embarrassingly parallel; if the benchmark
    ever outgrows broadcast, pre-bucket both sides with
    :func:`~readability_spark.operators.similarity.lsh_table_keys` and
    score per bucket (the embedding_near_dup_pairs shape).
    """
    from readability_spark.operators.similarity import _dot, _norm

    b = bench.select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("b_emb")
    )
    scored = train.crossJoin(F.broadcast(b)).select(
        "vec_id",
        "bench_id",
        round4(
            _dot(F.col("embedding"), F.col("b_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("b_emb")))
        ).alias("cosine"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("bench_id")).alias("neg_id"))).alias("m")
    )
    return best.select(
        "vec_id",
        (-F.col("m.neg_id")).alias("nearest_bench_id"),
        F.col("m.cosine").alias("max_cosine"),
        (F.col("m.cosine") < tau).alias("keep"),
    )
