"""Text-analysis operators for training-data pipelines over `documents`.

All hot-path logic is JVM-side column expressions (split / filter / regexp —
whole-stage codegen, no Python). Each operator has a matching DuckDB oracle in
__spark_entry__ that recomputes the same deterministic definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4

# Function-word lists for the n-gram/stopword language heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
ES_STOPWORDS = ("el", "la", "de", "los", "las", "y", "en", "es", "un", "una")


def _hits_expr(col: str, words: tuple) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"size(filter(split({col}, ' '), x -> array_contains(array({arr}), x)))"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (word-count + extra units for long words, ~4 chars per subword)."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        (
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4)).cast("long"),
            )
        ).alias("n_subwords"),
        round4(
            (F.length("text") - (F.size(toks) - 1)) / F.size(toks)
        ).alias("avg_word_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length, stopword ratio, punctuation
    ratio, repetition (distinct-token ratio); composite score in [0,1]."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    en_hits = F.expr(_hits_expr("text", EN_STOPWORDS))
    # Lowercase first so uppercase letters aren't miscounted as punctuation
    # (real crawl text is mixed-case even though the synthetic corpus is not).
    punct_chars = F.length("text") - F.length(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = en_hits / n
    score = _quality_col()
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        round4(stop_ratio).alias("stopword_ratio"),
        round4(punct_chars / F.length("text")).alias("punct_ratio"),
        round4(distinct_ratio).alias("distinct_ratio"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic (en vs es), with the table's own lang
    column retained for accuracy evaluation."""
    en_hits = F.expr(_hits_expr("text", EN_STOPWORDS))
    es_hits = F.expr(_hits_expr("text", ES_STOPWORDS))
    return docs.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        es_hits.alias("es_hits"),
        F.when(en_hits >= es_hits, F.lit("en")).otherwise(F.lit("es")).alias("lang_pred"),
    )


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style repetition quality signals over token n-grams:

    - ``top_gram_frac``: fraction of n-gram slots taken by the single most
      frequent n-gram (Gopher's "fraction of characters in the most common
      n-gram", token-based);
    - ``dup_gram_frac``: fraction of n-gram slots whose n-gram occurs more
      than once in the document (Gopher's duplicate-n-gram fraction).

    Boilerplate-heavy and looped/generated text scores high on both; the
    training-corpus selector can threshold them alongside quality_score.

    Plan shape: explode n-grams → two hash aggregations, both map-side
    combined ((doc_id, gram) then doc_id) — shuffles carry one row per
    distinct gram, linear at any corpus size. Docs with fewer than ``n``
    tokens are excluded (no n-gram is defined for them).
    """
    toks = F.split(F.col("text"), " ")
    grams = (
        docs.filter(F.size(toks) >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                )
            ).alias("gram"),
        )
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.max("cnt").alias("top_gram_count"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
                "dup_gram_tokens"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("top_gram_count").cast("int").alias("top_gram_count"),
            round4(F.col("top_gram_count") / F.col("n_grams")).alias("top_gram_frac"),
            round4(F.col("dup_gram_tokens") / F.col("n_grams")).alias("dup_gram_frac"),
        )
    )


QUANTILES = (0.25, 0.5, 0.75, 0.95, 0.99)


def length_quantiles(docs: DataFrame, exact: bool = True) -> DataFrame:
    """Per-language document-length distribution (p25/p50/p75/p95/p99 of
    ``n_chars``) — the corpus-report numbers a pipeline publishes per crawl
    snapshot.

    ``exact=True`` uses Spark's exact ``percentile`` aggregate (linear
    interpolation — value-identical to DuckDB ``quantile_cont``, which is
    what makes the oracle exact). Exact percentile buffers each group's
    values on the agg side, so at 10^12 rows per language switch
    ``exact=False``: ``approx_percentile`` (t-digest, bounded memory,
    map-side combined) — same schema, rank error <= 1/accuracy.
    """
    if exact:
        pcts = F.percentile("n_chars", F.array(*[F.lit(p) for p in QUANTILES]))
    else:
        pcts = F.approx_percentile(
            F.col("n_chars").cast("double"), F.array(*[F.lit(p) for p in QUANTILES]), F.lit(10000)
        )
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), pcts.alias("p")
    )
    return agg.select(
        "lang",
        "n_docs",
        *[
            round4(F.col("p")[i]).alias(f"p{int(p * 100)}")
            for i, p in enumerate(QUANTILES)
        ],
    )


# Gopher's required-word list (Rae et al. 2021 §A1.1): a doc must contain
# at least 2 of these to pass the stopword rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_terms(stopwords: tuple) -> dict:
    """The five Gopher rule inputs as named Columns over the current row's
    ``text`` — shared by :func:`gopher_rules` (full per-rule report) and
    :func:`filter_attrition` (pass/fail only) so the rule arithmetic has
    exactly one definition."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mean_len = (F.length("text") - (n - 1)) / n
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    # symbol occurrences: '#', ASCII '...' (3 chars per hit), unicode '…'
    ln = F.length("text")
    symbols = (
        (ln - F.length(F.replace(F.col("text"), F.lit("#"))))
        + (ln - F.length(F.replace(F.col("text"), F.lit("...")))) / 3
        + (ln - F.length(F.replace(F.col("text"), F.lit("…"))))
    )
    stop_hits = F.size(
        F.filter(
            F.array_distinct(toks),
            lambda w: F.array_contains(
                F.array(*[F.lit(s) for s in stopwords]), w
            ),
        )
    )
    return {
        "n": n,
        "mean_len": mean_len,
        "alpha_words": alpha_words,
        "symbols": symbols,
        "stop_hits": stop_hits,
    }


def _gopher_pass(stopwords: tuple, min_stop_hits: int) -> "F.Column":
    t = _gopher_terms(stopwords)
    n, mean_len = t["n"], t["mean_len"]
    return (
        (n >= 50)
        & (n <= 100000)
        & (mean_len >= 3)
        & (mean_len <= 10)
        & (t["alpha_words"] / n >= 0.8)
        & (t["symbols"] / n <= 0.1)
        & (t["stop_hits"] >= min_stop_hits)
    )


def _quality_col() -> "F.Column":
    """The composite quality score as a Column over the current row's
    ``text`` — shared by :func:`quality_score` and
    :func:`filter_attrition`."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    en_hits = F.expr(_hits_expr("text", EN_STOPWORDS))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = en_hits / n
    len_score = F.least(F.lit(1.0), n / F.lit(64.0))
    return round4(
        0.4 * len_score
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 4)
        + 0.3 * distinct_ratio
    )


def gopher_rules(
    docs: DataFrame,
    stopwords: tuple = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, MassiveWeb §A1.1),
    the rule set most LLM crawl pipelines start from. Per doc:

    - word count in [50, 100000];
    - mean word length in [3, 10];
    - >= 80% of words contain at least one alphabetic character;
    - symbol-to-word ratio (# and ellipsis) <= 0.1;
    - at least ``min_stop_hits`` distinct hits from ``stopwords``
      (default: Gopher's 8 required words);

    and ``gopher_pass`` = all of the above. Line-based rules (bullet/ellipsis
    line fractions) are omitted: the corpus schema's ``text`` is a single
    whitespace-normalized line, so no line structure survives extraction.

    One codegen projection, no shuffle, no Python.
    """
    t = _gopher_terms(stopwords)
    n, mean_len = t["n"], t["mean_len"]
    alpha_words, symbols, stop_hits = t["alpha_words"], t["symbols"], t["stop_hits"]
    ok_words = (n >= 50) & (n <= 100000)
    ok_mean_len = (mean_len >= 3) & (mean_len <= 10)
    ok_alpha = alpha_words / n >= 0.8
    ok_symbol = symbols / n <= 0.1
    ok_stop = stop_hits >= min_stop_hits
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        round4(mean_len).alias("mean_word_len"),
        round4(alpha_words / n).alias("alpha_word_frac"),
        round4(symbols / n).alias("symbol_ratio"),
        stop_hits.alias("stopword_hits"),
        ok_words.alias("ok_words"),
        ok_mean_len.alias("ok_mean_len"),
        ok_alpha.alias("ok_alpha"),
        ok_symbol.alias("ok_symbol"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_mean_len & ok_alpha & ok_symbol & ok_stop).alias("gopher_pass"),
    )


def fingerprint(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """Document fingerprints: exact md5 plus a shingle fingerprint (min md5
    over token 3-grams — order-robust near-dup key, winnowing-style)."""
    toks = F.split(F.col("text"), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle))),
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        F.array_min(shingles).alias("shingle_fp"),
    )


# ---------------------------------------------------------------------------
# Unicode script detection (shared Spark/SQL generator, pure codegen)
# ---------------------------------------------------------------------------

# (name, ((lo, hi), ...) code-point ranges, lowercase translate base) — the
# translate base is where with_injected_scripts maps a-z so injected docs are
# guaranteed inside the block. BMP only, no surrogates.
SCRIPT_RANGES: tuple = (
    ("latin", ((0x0041, 0x005A), (0x0061, 0x007A)), ord("a")),
    ("cyrillic", ((0x0400, 0x04FF),), 0x0430),
    ("greek", ((0x0370, 0x03FF),), 0x03B1),
    ("cjk", ((0x4E00, 0x9FFF),), 0x4E00),
    ("arabic", ((0x0600, 0x06FF),), 0x0620),
)

_LATIN26 = "abcdefghijklmnopqrstuvwxyz"


def script_class(ranges: tuple) -> str:
    """Regex character class for code-point ranges — literal unicode chars,
    valid in BOTH Java regex (Spark) and RE2 (DuckDB). One generator feeds
    the operator and the oracle so the two can't drift."""
    return "[" + "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in ranges) + "]"


def injected_alphabet(base: int) -> str:
    """26 consecutive code points starting at the block's letter base — the
    target of translate(a-z -> block) for deterministic script injection."""
    return "".join(chr(base + i) for i in range(26))


def with_injected_scripts(docs: DataFrame) -> DataFrame:
    """Deterministically re-script a slice of the corpus so script detection
    has non-Latin text to find: every doc_id % 7 == 3 is transliterated to
    Cyrillic, % 7 == 5 to CJK (translate a-z onto the block's first 26 code
    points — SQL-expressible, the oracle applies the same translate)."""
    bases = {name: base for name, _, base in SCRIPT_RANGES}
    cyr = injected_alphabet(bases["cyrillic"])
    cjk = injected_alphabet(bases["cjk"])
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 3, F.translate(F.col("text"), _LATIN26, cyr))
        .when(F.col("doc_id") % 7 == 5, F.translate(F.col("text"), _LATIN26, cjk))
        .otherwise(F.col("text")),
    )


def script_mix(docs: DataFrame) -> DataFrame:
    """Per-document unicode-script histogram + dominant script: count of
    characters in each major script block (regexp strip-and-diff — whole-
    stage codegen, no Python) and the argmax with deterministic
    first-listed-wins tie-breaking. The per-row cost is O(len * n_scripts)
    with zero shuffles — the shape that survives any corpus size."""
    counts = {
        name: (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), script_class(ranges), ""))
        ).cast("int")
        for name, ranges, _ in SCRIPT_RANGES
    }
    sel = docs.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in SCRIPT_RANGES],
    )
    # argmax, ties to the first-listed script: fold the CASE chain from the
    # last name outward so earlier names overwrite later ones at equal count.
    names = [r[0] for r in SCRIPT_RANGES]
    maxc = F.greatest(*[F.col(f"n_{n}") for n in names])
    dom = F.lit("none")
    for n in reversed(names):
        dom = F.when((F.col(f"n_{n}") == maxc) & (maxc > 0), F.lit(n)).otherwise(dom)
    return sel.withColumn("dominant_script", dom)


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps-law curve) over doc-id-ordered corpus prefixes
# ---------------------------------------------------------------------------

VOCAB_CHECKPOINTS = (50, 100, 200, 400, 800, 1600)


def vocab_growth(docs: DataFrame, checkpoints: tuple = VOCAB_CHECKPOINTS) -> DataFrame:
    """Heaps-law vocabulary-growth curve: for each corpus prefix (docs with
    ``doc_id < c``), the number of token occurrences and the distinct
    vocabulary size — the saturation diagnostic a corpus report publishes
    per crawl (V ~ k·N^beta; a flattening curve means new data stops adding
    new vocabulary).

    Scale shape: ONE map-side-combined groupBy(token) computing
    min(doc_id) — the only shuffle, carrying one row per distinct token —
    then a single conditional global aggregate per checkpoint (no per-prefix
    rescans: a token is in prefix c's vocabulary iff its FIRST occurrence is
    before c, so all checkpoints read the same first-occurrence table).
    Occurrence totals come straight off the docs scan without exploding.
    """
    toks = F.split(F.col("text"), " ")
    first = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vrow = first.agg(
        *[
            F.sum((F.col("first_doc") < c).cast("long")).alias(f"v{i}")
            for i, c in enumerate(checkpoints)
        ]
    )
    drow = docs.agg(
        *[
            F.sum(F.when(F.col("doc_id") < c, F.size(toks)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"o{i}")
            for i, c in enumerate(checkpoints)
        ],
        *[
            F.sum((F.col("doc_id") < c).cast("long")).alias(f"d{i}")
            for i, c in enumerate(checkpoints)
        ],
    )
    stack = ", ".join(
        f"{c}, d{i}, o{i}, v{i}" for i, c in enumerate(checkpoints)
    )
    return (
        vrow.crossJoin(drow)  # two 1-row aggregates
        .selectExpr(
            f"stack({len(checkpoints)}, {stack}) "
            "as (checkpoint, n_docs, n_token_occurrences, vocab_size)"
        )
        .where(F.col("n_docs") > 0)
    )


# ---------------------------------------------------------------------------
# Corpus drift: per-token KL contributions between two corpus slices
# ---------------------------------------------------------------------------

def token_drift(docs: DataFrame, k: int = 25) -> DataFrame:
    """Distribution drift between two corpus slices (A = even doc_id,
    B = odd — stand-ins for 'this crawl' vs 'last crawl'): the top-k tokens
    by absolute add-1-smoothed KL contribution
    ``p·ln(p/q)·10^6`` (micro-nats, round4) where
    p = (cnt_a+1)/(n_a+V), q = (cnt_b+1)/(n_b+V). The report a pipeline
    publishes when a new snapshot's token mix shifts (spam bursts,
    template changes, language drift).

    Scale shape: ONE map-side-combined groupBy(token) computes both
    slices' counts as conditional sums (no per-slice scans, no join of
    two count tables); the totals are a broadcast one-row integer
    aggregate, so every float is derived per-row from integers —
    deterministic and oracle-exact. Top-k is orderBy+limit — Spark plans
    TakeOrderedAndProject (per-partition partial top-k, no global sort
    materialization). Ties break on the token string.
    """
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok"),
        (F.col("doc_id") % 2 == 0).cast("long").alias("in_a"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum("in_a").alias("cnt_a"),
        F.sum(1 - F.col("in_a")).alias("cnt_b"),
    )
    # counts feeds two consumers (the totals aggregate and the per-token
    # projection); without a barrier the token explode + groupBy runs twice
    # (self-reference defeats ReuseExchange — same issue as minhash buckets)
    counts = counts.localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.count("*").alias("v"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p = (F.col("cnt_a") + 1) / (F.col("n_a") + F.col("v"))
    q = (F.col("cnt_b") + 1) / (F.col("n_b") + F.col("v"))
    drift = round4(F.lit(1000000.0) * p * F.log(p / q))
    return (
        j.select(
            "tok",
            F.col("cnt_a").cast("long").alias("cnt_a"),
            F.col("cnt_b").cast("long").alias("cnt_b"),
            drift.alias("drift_micro"),
        )
        .orderBy(F.abs(F.col("drift_micro")).desc(), F.col("tok").asc())
        .limit(k)
    )


def domain_quality_prior(docs: DataFrame, threshold: float = 0.55) -> DataFrame:
    """Empirical-Bayes per-domain quality prior: shrink each domain's
    observed good-doc rate toward the corpus-level Beta prior fit by
    method of moments — the calibrated per-site reputation a crawl
    filter should use instead of raw rates (a domain with 3/4 good pages
    must not outrank one with 900/1000; shrinkage fixes exactly that).

    A doc is "good" iff its round4-floored composite quality (see
    :func:`quality_score`) >= ``threshold`` — comparing the rounded
    value keeps the gate bit-exact across engines. With per-domain
    (n_k, k_k) and rates p_k, the moment estimates m = avg(p),
    v = avg(p^2) - m^2 give prior strength s = m(1-m)/v - 1
    (alpha = m*s, beta = (1-m)*s); degenerate corpora (v ~ 0 or s <= 0)
    fall back to the flat Beta(1,1). Posterior mean per domain:
    (k_k + alpha) / (n_k + s).

    Scale shape: one corpus scan -> map-side-combined groupBy(domain)
    for (n, k); every moment/shrinkage step after that is window
    arithmetic over the K-row DOMAIN table (driver-sized frame). At
    10^12 docs the cost is the quality projection + one K-group agg.

    Output: (domain, n_docs, n_good, raw_rate, shrunk_rate,
    prior_alpha, prior_beta) — prior columns constant across rows.
    """
    from pyspark.sql import Window

    q = quality_score(docs).select("doc_id", "quality")
    d = docs.select("doc_id", F.col("source").alias("domain")).join(q, "doc_id")
    per = d.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("quality") >= F.lit(float(threshold))).cast("int"))
        .cast("bigint")
        .alias("n_good"),
    )
    wall = Window.partitionBy()
    p = F.col("n_good") / F.col("n_docs")
    step = (
        per.withColumn("p", p)
        .withColumn("m", F.avg("p").over(wall))
        .withColumn("v", F.avg(F.col("p") * F.col("p")).over(wall))
    )
    var = F.col("v") - F.col("m") * F.col("m")
    s_raw = F.col("m") * (F.lit(1.0) - F.col("m")) / var - F.lit(1.0)
    # flat Beta(1,1) when moments degenerate (near-zero variance or s<=0)
    ok = (var > F.lit(1e-12)) & (s_raw > F.lit(0.0))
    s = F.when(ok, s_raw).otherwise(F.lit(2.0))
    alpha = F.when(ok, F.col("m") * s_raw).otherwise(F.lit(1.0))
    beta = s - alpha
    return step.select(
        "domain",
        "n_docs",
        "n_good",
        round4(F.col("p")).alias("raw_rate"),
        round4((F.col("n_good") + alpha) / (F.col("n_docs") + s)).alias("shrunk_rate"),
        round4(alpha).alias("prior_alpha"),
        round4(beta).alias("prior_beta"),
    )


def corpus_card(docs: DataFrame) -> DataFrame:
    """One-row dataset card — the summary a corpus release publishes:
    sizes, language/source breadth, exact-duplicate rate, and mean
    composite quality. All from ONE global aggregation over per-row
    projections (the md5 distinct for dup rate is the only
    cardinality-heavy term, and it's the same partial-agg shape as
    exact dedup), so the card costs a single corpus scan.

    Output: (n_docs, n_tokens, n_chars, n_langs, n_sources,
    exact_dup_rate, mean_quality).
    """
    from readability_spark.operators.dedup import round4

    q = quality_score(docs).select("doc_id", "quality")
    j = docs.join(q, "doc_id")
    agg = j.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique"),
        F.avg("quality").alias("avg_q"),
    )
    return agg.select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_sources",
        round4((F.col("n_docs") - F.col("n_unique")) / F.col("n_docs")).alias(
            "exact_dup_rate"
        ),
        round4(F.col("avg_q")).alias("mean_quality"),
    )


def lexical_diversity(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group lexical diversity — the vocabulary-richness quality
    signal (template/spam farms repeat a tiny vocabulary; genuine prose
    doesn't): type-token ratio and hapax-legomena fraction per group.

    Scale shape: one exploded-token groupBy (group, token) with
    map-side combine — a hot token contributes one partial count per
    partition — then a K-group rollup of four longs. No token list ever
    funnels through one task.

    Output: (grp, n_tokens, n_types, n_hapax, type_token_ratio,
    hapax_frac) — ratios round4.
    """
    from readability_spark.operators.dedup import round4

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    counts = toks.groupBy("grp", "tok").agg(F.count("*").alias("c"))
    per = counts.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("n_hapax"),
    )
    return per.select(
        "grp",
        "n_tokens",
        "n_types",
        "n_hapax",
        round4(F.col("n_types") / F.col("n_tokens")).alias("type_token_ratio"),
        round4(F.col("n_hapax") / F.col("n_types")).alias("hapax_frac"),
    )


def signal_correlation(
    scored_a: DataFrame,
    scored_b: DataFrame,
    by: DataFrame,
    col_a: str,
    col_b: str,
    group_col: str = "lang",
) -> DataFrame:
    """Per-group Pearson correlation between two per-document quality
    signals — the calibration report that tells a pipeline whether its
    cheap heuristic agrees with its expensive model score (and where:
    a language whose correlation collapses needs its own thresholds).

    Scale shape: two doc_id-keyed joins of slim (doc_id, score)
    projections, then one map-side-combined groupBy computing the
    correlation moments. Nothing but ids and doubles shuffles.

    Output: (grp, n_docs, corr) — corr round4, NULL when degenerate.
    """
    from readability_spark.operators.dedup import round4

    j = (
        by.select("doc_id", F.col(group_col).alias("grp"))
        .join(scored_a.select("doc_id", col_a), "doc_id")
        .join(scored_b.select("doc_id", col_b), "doc_id")
    )
    return j.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        round4(F.corr(col_a, col_b)).alias("corr"),
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Character-level Shannon entropy per document — the compression-ratio
    quality proxy (RefinedWeb/Dolma use gzip ratio; unigram char entropy is
    its codec-free analogue and needs no Python). Very LOW entropy flags
    repeated-character/boilerplate junk; very HIGH flags base64 blobs,
    minified code, or random spam — both tails are filter targets.

    Computed as H = log2(n) - (1/n) * Σ c_i*log2(c_i) over per-char counts
    c_i. Engine determinism: each c_i*log2(c_i) term is quantized to a
    bigint (floor(x*1e6)) before the per-doc sum, so the aggregation is
    exact integer arithmetic — order-independent across engines (log2 of
    a small exact integer may differ by 1 ulp between libms; the floor
    boundary risk is the same accepted class as weighted_sample's).

    Plan shape: explode chars → count per (doc, char) → per-doc agg, both
    groupBys map-side combined; shuffle rows are bounded by
    docs × alphabet, not corpus chars. Pure codegen, no Python.

    Output: (doc_id, n_chars, n_distinct_chars, entropy_bits,
    entropy_ratio) — ratio is H / log2(distinct), 1.0 = uniform usage.
    """
    chars = docs.filter(F.length("text") > 0).select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    term = F.floor(
        F.col("c").cast("double") * F.log2(F.col("c").cast("double")) * 1e6
    ).cast("long")
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count("*").alias("n_distinct_chars"),
        F.sum(term).alias("sq"),
    )
    h = F.log2(F.col("n_chars").cast("double")) - (
        F.col("sq").cast("double") / 1e6
    ) / F.col("n_chars").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_distinct_chars").cast("int").alias("n_distinct_chars"),
        round4(h).alias("entropy_bits"),
        round4(
            F.when(
                F.col("n_distinct_chars") > 1,
                h / F.log2(F.col("n_distinct_chars").cast("double")),
            ).otherwise(F.lit(0.0))
        ).alias("entropy_ratio"),
    )


def quality_threshold_calibrate(
    docs: DataFrame, keep_rate: float = 0.4, exact: bool = True
) -> DataFrame:
    """Per-language quality-threshold calibration — the CCNet-style
    normalization step: instead of one global cutoff (which would gut
    low-resource languages whose score distributions sit lower), pick
    each language's threshold at the (1 - keep_rate) quantile of ITS OWN
    quality distribution, so every language keeps ~keep_rate of its
    docs. Returns the per-language report a pipeline publishes before
    committing thresholds to a filter config.

    The comparison bound is the round4-ed quantile (both engines
    quantize the interpolated value identically, so the >= gate can't
    flip on a last-ulp interpolation difference). ``exact=True`` uses
    the exact percentile aggregate; switch to ``exact=False``
    (approx_percentile, t-digest) past ~10^9 docs per language — same
    schema, bounded agg memory.

    Plan shape: one score projection, one per-lang agg (K rows), one
    broadcast join back + one counting agg. No windows, no sorts.

    Output: (lang, n_docs, threshold, n_kept, kept_rate).
    """
    from readability_spark.operators.dedup import round4

    p = 1.0 - float(keep_rate)
    scored = (
        quality_score(docs)
        .select("doc_id", "quality")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    if exact:
        pct = F.percentile("quality", F.lit(p))
    else:
        pct = F.approx_percentile(F.col("quality"), F.lit(p), F.lit(10000))
    th = scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"), round4(pct).alias("threshold")
    )
    kept = (
        scored.join(F.broadcast(th.select("lang", "threshold")), "lang")
        .filter(F.col("quality") >= F.col("threshold"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return th.join(kept, "lang", "left").select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "threshold",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        round4(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs")).alias("kept_rate"),
    )


#: Flesch / Flesch-Kincaid surface patterns — module constants so the
#: DuckDB oracle embeds the SAME strings (Java regex and RE2 agree on all
#: of them: literal classes, ``+`` repeats, and the ASCII ``\b`` word
#: boundary, which both engines define over ``[A-Za-z0-9_]``).
PAT_SENTENCE = "[.!?]+"
PAT_WORD = "[A-Za-z]+"
PAT_VOWEL_RUN = "[AEIOUYaeiouy]+"
#: Consonant-only words contribute one syllable each ("Dr", "nth") — the
#: floor-1-per-word rule without a per-word explode.
PAT_NOVOWEL_WORD = r"\b[BCDFGHJKLMNPQRSTVWXZbcdfghjklmnpqrstvwxz]+\b"


def readability_scores(docs: DataFrame) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade over ``(doc_id, text)``.

    The classic prose-difficulty signal quality filters bolt on next to
    stopword/punctuation ratios: FRE = 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words); FKGL = 0.39·(words/sentences)
    + 11.8·(syllables/words) − 15.59.

    All inputs are exact integer regex counts (sentences = ``[.!?]+``
    runs, words = letter runs, syllables = vowel-group runs + one per
    consonant-only word — the standard vowel-run approximation). The two
    ratios are round4-quantized FIRST, the linear formulas are evaluated
    on the quantized ratios, and the results are round4-ed again — both
    engines run the same double ops on identical inputs, so the scores
    and the CASE band below them are hash-stable cross-engine.

    Empty / wordless / sentenceless text yields 0-ratios and NULL-free
    0 scores with band ``'empty'``. Zero shuffles — one codegen
    projection; embarrassingly parallel at any corpus size.

    Output: ``doc_id, n_sentences, n_words, n_syllables,
    words_per_sentence, syllables_per_word, flesch_reading_ease,
    fk_grade, reading_band``.
    """

    def cnt(pat: str) -> F.Column:
        return F.regexp_count(F.col("text"), F.lit(pat)).cast("bigint")

    base = docs.select(
        "doc_id",
        cnt(PAT_SENTENCE).alias("n_sentences"),
        cnt(PAT_WORD).alias("n_words"),
        (cnt(PAT_VOWEL_RUN) + cnt(PAT_NOVOWEL_WORD)).alias("n_syllables"),
    )
    ok = (F.col("n_sentences") > 0) & (F.col("n_words") > 0)
    ratios = base.select(
        "*",
        round4(
            F.when(ok, F.col("n_words") / F.col("n_sentences")).otherwise(F.lit(0.0))
        ).alias("words_per_sentence"),
        round4(
            F.when(ok, F.col("n_syllables") / F.col("n_words")).otherwise(F.lit(0.0))
        ).alias("syllables_per_word"),
    )
    fre = round4(
        F.when(
            ok,
            F.lit(206.835)
            - 1.015 * F.col("words_per_sentence")
            - 84.6 * F.col("syllables_per_word"),
        ).otherwise(F.lit(0.0))
    )
    fkg = round4(
        F.when(
            ok,
            0.39 * F.col("words_per_sentence")
            + 11.8 * F.col("syllables_per_word")
            - F.lit(15.59),
        ).otherwise(F.lit(0.0))
    )
    scored = ratios.select("*", fre.alias("flesch_reading_ease"), fkg.alias("fk_grade"))
    band = (
        F.when(~ok, F.lit("empty"))
        .when(F.col("flesch_reading_ease") >= 70.0, F.lit("easy"))
        .when(F.col("flesch_reading_ease") >= 50.0, F.lit("standard"))
        .when(F.col("flesch_reading_ease") >= 30.0, F.lit("difficult"))
        .otherwise(F.lit("very_difficult"))
    )
    return scored.select("*", band.alias("reading_band"))


#: Ordered stage labels of the curation funnel — module constant so the
#: DuckDB oracle and the tests name the stages identically.
ATTRITION_STAGES = ("0_input", "1_lang_en", "2_gopher", "3_quality", "4_exact_dedup")


def filter_attrition(
    docs: DataFrame,
    stopwords: tuple = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
    quality_threshold: float = 0.55,
) -> DataFrame:
    """Curation-funnel attrition report: how many documents (and tokens)
    survive each stage of the standard web-corpus filter chain, cumulatively
    — the per-stage table a dataset release publishes (FineWeb/Dolma-style
    "documents remaining after each filter").

    Stages, applied in pipeline order (each includes all earlier ones):

    1. ``0_input`` — everything;
    2. ``1_lang_en`` — the language-ID gate (the table's ``lang`` column is
       the upstream language-ID output);
    3. ``2_gopher`` — the Gopher/MassiveWeb document rules
       (:func:`gopher_rules`, shared arithmetic via ``_gopher_terms``);
    4. ``3_quality`` — composite quality (:func:`quality_score`'s score,
       shared via ``_quality_col``) at least ``quality_threshold``;
    5. ``4_exact_dedup`` — exact keep-first dedup *among stage-3
       survivors*: a doc survives iff its ``doc_id`` is the smallest among
       surviving docs with byte-identical text (dedup after filtering, the
       order real pipelines use — a filtered-out early copy must not shadow
       a surviving later one).

    Scale shape at 100 TB: one corpus scan computes every per-doc flag in a
    single codegen projection (all stages but dedup are row-local); the
    dedup election is one hash Exchange on ``md5(text)`` — the exact-dedup
    shuffle shape, carrying only ``(fp, doc_id, n_tokens, 3 booleans)``,
    never text. The stage counters are then ONE map-side-combined global
    aggregation (10 longs), and the 5-row stage table is a constant-size
    projection of that single row. No per-stage corpus passes.

    Output: ``stage_idx, stage, docs_kept, tokens_kept, docs_rate,
    tokens_rate`` — 5 rows, rates round4 relative to ``0_input``.
    """
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    c1 = F.col("lang") == "en"
    c2 = c1 & _gopher_pass(stopwords, min_stop_hits)
    c3 = c2 & (_quality_col() >= quality_threshold)
    flags = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.md5("text").alias("fp"),
        c1.alias("c1"),
        c2.alias("c2"),
        c3.alias("c3"),
    )
    keep_min = F.min(F.when(F.col("c3"), F.col("doc_id"))).over(
        Window.partitionBy("fp")
    )
    staged = flags.select(
        "*", (F.col("c3") & (F.col("doc_id") == keep_min)).alias("c4")
    )

    def d(c) -> F.Column:
        return F.coalesce(
            F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).cast("bigint")

    def t(c) -> F.Column:
        return F.coalesce(
            F.sum(F.when(c, F.col("n_tokens")).otherwise(F.lit(0))), F.lit(0)
        ).cast("bigint")

    agg = staged.agg(
        F.count("*").cast("bigint").alias("d0"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("t0"),
        *[d(F.col(f"c{i}")).alias(f"d{i}") for i in (1, 2, 3, 4)],
        *[t(F.col(f"c{i}")).alias(f"t{i}") for i in (1, 2, 3, 4)],
    )
    stacked = agg.select(
        F.expr(
            "stack(5, "
            + ", ".join(
                f"{i}, '{name}', d{i}, t{i}"
                for i, name in enumerate(ATTRITION_STAGES)
            )
            + ") AS (stage_idx, stage, docs_kept, tokens_kept)"
        ),
        "d0",
        "t0",
    )
    return stacked.select(
        "stage_idx",
        "stage",
        "docs_kept",
        "tokens_kept",
        round4(
            F.when(F.col("d0") > 0, F.col("docs_kept") / F.col("d0")).otherwise(
                F.lit(0.0)
            )
        ).alias("docs_rate"),
        round4(
            F.when(F.col("t0") > 0, F.col("tokens_kept") / F.col("t0")).otherwise(
                F.lit(0.0)
            )
        ).alias("tokens_rate"),
    )


def zipf_slope(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Zipf-law slope per group: OLS fit of log(freq) on log(rank) over
    the group's token frequency spectrum — the companion diagnostic to
    :func:`vocab_growth` (Heaps). Natural text sits near slope -1;
    boilerplate-heavy or template corpora flatten (repeated tokens fatten
    the head), spam with generated gibberish steepens the tail. Output:
    (grp, n_types, n_tokens, zipf_slope).

    Scale shape: one map-side-combined groupBy((grp, token)) count — the
    only corpus-sized shuffle — then a per-group rank window over the
    VOCABULARY-sized spectrum (the same vocab-bounded contract as
    lexical_diversity / the LM tables) and one final per-group aggregate.

    Engine determinism: ln(rank) and ln(count) are computed on exact
    integer inputs and quantized to a 1e6 bigint grid; every OLS sum is
    then exact integer arithmetic (decimal(38) for the cross products,
    which overflow int64 at web vocabularies), so both engines divide
    the same two integers — the slope is round4'd from one double
    division. Rank ties broken by token text, so the spectrum is a
    total order shared with the oracle.
    """
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.col(group_col).alias("grp"), F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("grp", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc("tok"))
    q = counts.withColumn("rank", F.row_number().over(w)).select(
        "grp",
        "c",
        F.floor(F.log(F.col("rank").cast("double")) * 1e6 + 0.5)
        .cast("long")
        .alias("qx"),
        F.floor(F.log(F.col("c").cast("double")) * 1e6 + 0.5).cast("long").alias("qy"),
    )
    dec = "decimal(38,0)"
    agg = q.groupBy("grp").agg(
        F.count("*").alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx").cast(dec) * F.col("qy").cast(dec)).alias("sxy"),
        F.sum(F.col("qx").cast(dec) * F.col("qx").cast(dec)).alias("sxx"),
    )
    n = F.col("n_types").cast(dec)
    num = (n * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)).cast("double")
    den = (n * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)).cast("double")
    return agg.select(
        "grp",
        "n_types",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        # a single-type group has zero x-variance: no fittable slope
        F.when(den != 0, round4(num / den)).alias("zipf_slope"),
    )
