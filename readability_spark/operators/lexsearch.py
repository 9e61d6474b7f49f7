"""BM25 lexical search over the document corpus.

The retrieval counterpart to the ANN paths in ``operators/similarity.py``:
where those rank by embedding cosine, :func:`bm25_topk` ranks by the
classic Okapi BM25 lexical score (Lucene formulation:
``idf = ln((N - df + 0.5) / (df + 0.5) + 1)``), the standard first-stage
retriever for dedup-by-query, decontamination probes, and corpus QA at
web scale.

Everything is JVM-side column expressions — no Python touches a token:

- document length ``dl`` is ``size(split(text))`` computed in the scan
  projection (no explode needed for lengths);
- the postings explode is *pruned to query terms before the shuffle* via a
  broadcast semi-join on the (tiny) distinct-term set, so shuffle volume
  is O(rows containing a query term), not O(total tokens) — the difference
  between a full-corpus shuffle and a sliver of it at 10^12 docs;
- corpus stats (N, sum dl) are one tiny aggregate broadcast back; ``avgdl``
  is derived as an explicit ``sum/count`` double division so an oracle can
  reproduce it bit-for-bit (no engine-specific AVG accumulation);
- per-term df and idf live on the query-term side (<= a few dozen rows),
  broadcast into the scoring join;
- the final per-query top-k is the salted two-phase rank (same shape as
  ``snapshots.domain_top_k``): a stop-word query term can match every
  document, and a single ``Window.partitionBy(query_id)`` would funnel
  10^12 rows through one task's sort. Phase 1 ranks within
  (query_id, doc_id % n_salts); phase 2 ranks the <= k*n_salts survivors.

Ranking ties are broken by doc_id, and the rank is computed over the
*rounded* score (4 decimals, shared ``round4`` floor trick) so exact-dup
documents — which score identically — order deterministically in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    hot_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the per-doc representation
    counterpart to :func:`bm25_topk`'s query-relevance ranking (keyword
    indexing, near-dup triage labels, topic sampling keys).

    Uses the sklearn-convention smoothed idf ``ln((N + 1) / (df + 1)) + 1``
    so no term gets a zero/negative weight. Returns one row per kept
    keyword: ``(doc_id, term, tf, df, score, rk)`` with ``rk`` 1..k per doc
    (ties broken by term; the rank is over the round4-floored score so
    exact-duplicate docs rank identically in any engine).

    Scale shape at 100 TB: term frequency is one map-side-combined groupBy
    of the exploded tokens; document frequency derives from the tf
    *aggregate* (one row per (doc, term) — the postings shuffle is shared
    via ReuseExchange, the corpus is scanned and exploded once). The
    df-to-postings join is where stopword skew lives — a shuffle join on
    ``term`` would route every posting of "the" through one task — so the
    vocabulary is split at ``hot_df``: terms in >= ``hot_df`` docs are by
    definition few (the vocabulary head) and their df table **broadcasts**
    (hot postings never shuffle for the join); the long tail shuffle-joins
    with per-term posting lists bounded by ``hot_df`` rows — no skew by
    construction (same split as the n-gram DF tagging in operators/dedup).
    The final top-k window partitions by doc_id, whose fan-in is bounded by
    distinct terms per document, not corpus size.
    """
    # NB: no redundant `alias("doc_id")` when id_col already is doc_id — a
    # surviving no-op Alias de-canonicalizes this branch's exchange vs the
    # df/hot branches' and silently duplicates the postings scan+explode
    # (ReuseExchange matches canonical plans only; pinned in
    # tests/test_frontier_lexsearch.py).
    id_expr = F.col(id_col) if id_col == "doc_id" else F.col(id_col).alias("doc_id")
    base = docs.select(
        id_expr,
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = base.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # count(when(tf > 0)) keeps tf live in this branch's partial aggregate so
    # it stays canonically equal to the scoring branch's and ReuseExchange
    # shares the one postings shuffle (same pin as bm25_topk's df branch).
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, True)).alias("df")
    )
    stats = docs.agg(F.count("*").cast("double").alias("n_docs"))

    hot = dfreq.filter(F.col("df") >= hot_df)
    cold = dfreq.filter(F.col("df") < hot_df)
    joined = tf.join(cold, "term").unionByName(
        tf.join(F.broadcast(hot), "term")
    )

    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
    scored = joined.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        round4(F.col("tf").cast("double") * idf).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


def query_terms(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """(query_id, query) → one row per (query_id, term); terms are the
    same whitespace tokens the corpus side uses."""
    return queries.select(
        "query_id", F.explode(F.split(F.col(query_col), " ")).alias("term")
    ).distinct()


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int = 16,
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Top-k BM25 hits per query: (query_id, doc_id, score, rk).

    ``queries`` is a small DataFrame (query_id: long, query: string); its
    term set is collected driver-side (tiny by contract — a query batch,
    not a corpus) and inlined as a literal ``isin`` filter on the exploded
    tokens. Literal-filter rather than broadcast-join on purpose: a
    ``createDataFrame`` side never canonicalizes equal across plan
    branches, which would defeat ReuseExchange and re-scan the corpus for
    the df aggregate; with the literal filter both the scoring and df
    branches share one postings shuffle (one corpus scan + explode total).

    ``corpus_stats=(n_docs, sum_dl)`` skips the corpus-statistics pass —
    at 10^12 docs N and total token count are table metadata you compute
    once per snapshot, not per query batch. When omitted they are derived
    with one extra scan of the text column.
    """
    terms = query_terms(queries)
    # tiny by contract: the distinct term set of a query batch
    term_list = sorted({r["term"] for r in terms.select("term").distinct().collect()})

    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"), toks.alias("_t"))

    # corpus stats: explicit sum/count division (engine-reproducible avgdl)
    if corpus_stats is not None:
        stats = docs.sparkSession.range(1).select(
            F.lit(float(corpus_stats[0])).alias("n_docs"),
            F.lit(float(corpus_stats[1])).alias("sum_dl"),
        )
    else:
        stats = base.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.sum("dl").cast("double").alias("sum_dl"),
        )

    # postings pruned to query terms BEFORE the tf shuffle
    post = (
        base.select("doc_id", "dl", F.explode("_t").alias("term"))
        .filter(F.col("term").isin(term_list))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )

    # df per query term (<= |terms| rows) — broadcast back into scoring.
    # count(when(tf > 0)) not count(*): tf >= 1 always so they're equal,
    # but a plain count lets Catalyst prove tf unused and prune the inner
    # count function, turning this branch's partial aggregate keys-only —
    # no longer canonically equal to the scoring branch's, which kills
    # ReuseExchange and re-scans + re-explodes the corpus. The opaque
    # tf > 0 predicate pins tf as live, so both branches share ONE
    # postings shuffle (asserted in tests/test_plan_shape.py).
    df_by_term = post.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, True)).alias("df")
    )

    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("tf").cast("double")
    term_score = idf * (
        tf * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )

    scored = (
        post.join(F.broadcast(df_by_term), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(round4(F.sum(term_score)).alias("score"))
    )

    order = [F.col("score").desc(), F.col("doc_id").asc()]
    w1 = Window.partitionBy("query_id", F.col("_salt")).orderBy(*order)
    phase1 = (
        scored.withColumn("_salt", F.col("doc_id") % n_salts)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("query_id", "doc_id", "score", "rk")
    )
