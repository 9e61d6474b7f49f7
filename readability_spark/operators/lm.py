"""CCNet-style n-gram language-model perplexity filtering.

The classic web-corpus quality step (CCNet, Wenzek et al. 2020): train a
small LM on a trusted slice of the corpus, score every document's
perplexity under it, and keep/route documents by perplexity band
(head / middle / tail). CCNet uses a 5-gram KenLM trained on Wikipedia;
here the model is an add-k-smoothed **bigram** LM trained on a
deterministic slice of the corpus itself — the same pipeline shape with
no native dependencies, and exactly reproducible by the DuckDB oracle.

Pipeline (all JVM column expressions, no Python UDFs):

1. **Train** — explode bigrams of the training slice
   (``doc_id % train_mod < train_keep``), one ``groupBy(w1, w2)`` for
   bigram counts, one map-side-combined re-aggregation for context counts,
   one distinct-count for vocabulary size V.
2. **Score** — explode every document's bigrams, join bigram + context
   counts, smoothed ``log p(w2|w1) = ln((c2 + k) / (c1 + k·V))``, per-doc
   average, ``ppl = exp(-avg)``.
3. **Band** — fixed perplexity thresholds → head/middle/tail. CCNet
   computes its cutoffs once per language on a sample and ships them as
   config; mirroring that, thresholds are parameters (literals in the
   plan), NOT a global ntile window — a single-partition ``ntile`` over
   10^12 rows is a scale-killer, and approx_percentile is not
   engine-reproducible.

Scale shape: two shuffles on token-pair keys to build the model (counts
are map-side combined), one shuffle join of exploded document bigrams
against the model (both sides are (word-pair, long) rows — the html/text
payload never enters the shuffle), and one final per-doc aggregation.
Hot-key note: bigram frequency is zipfian, but the count aggregations
combine map-side, so no task absorbs a hot bigram's full posting list;
the scoring join's build side is the *model* (bounded by vocab², pruned
by min_count at real scale), not the corpus.

Determinism: ln/exp double math differs across engines only in summation
order (~1e-15 relative); outputs are round4-floored like the PageRank and
classifier operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent whitespace-token pair."""
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    pairs = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(t) - 2),"
            " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
        ).alias("bg"),
    )
    ex = pairs.select("doc_id", F.explode("bg").alias("b"))
    return ex.select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))


def train_bigram_lm(
    docs: DataFrame, train_mod: int = 10, train_keep: int = 8
) -> tuple:
    """Bigram counts, context counts, and vocab size from the deterministic
    training slice ``doc_id % train_mod < train_keep``.

    Returns (bigram_counts, context_counts, vocab_df): DataFrames
    (w1, w2, c2), (w1, c1), and a 1-row (v,) — kept as DataFrames so the
    whole pipeline stays one lazy plan (no driver collect in the loop).
    """
    train = docs.filter(F.col("doc_id") % train_mod < train_keep)
    bg = _doc_bigrams(train)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    toks = train.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    return c2, c1, vocab


def score_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    k: float = 0.5,
    broadcast_contexts: bool = True,
) -> DataFrame:
    """Per-doc add-k bigram perplexity: (doc_id, n_bigrams, n_oov, ppl).

    Documents with fewer than 2 tokens have no bigrams and are absent from
    the output (they carry no LM evidence; filter them upstream with the
    length rules). n_oov counts bigrams unseen in training.

    ``broadcast_contexts`` hints the (w1, c1) join side as a broadcast:
    the context table has one row per distinct *training* token, i.e. it
    is vocabulary-bounded — the same contract that makes KenLM's vocab fit
    in memory per CCNet worker — so the exploded document-bigram stream
    shuffles ONCE (on the (w1, w2) model join) instead of twice.

    CAUTION — the True default assumes a *pruned/bounded* vocabulary. The
    hint is unconditional: on an unpruned web-scale token vocabulary it
    will OOM the driver/executors building the broadcast table, and
    nothing falls back automatically. Pass False for an unbounded
    vocabulary: no hint is forced, so the planner's own size estimate
    decides — an oversized context table degrades to a second (w1)-keyed
    shuffle of the doc bigrams (correct, just one more exchange) instead
    of an OOM, and a genuinely small one may still broadcast (set
    spark.sql.autoBroadcastJoinThreshold=-1 to force the shuffled join,
    as the plan-shape test does).
    """
    if not isinstance(broadcast_contexts, bool):
        raise ValueError(
            f"broadcast_contexts must be a bool, got {broadcast_contexts!r}"
        )
    db = _doc_bigrams(docs)
    ctx = F.broadcast(context_counts) if broadcast_contexts else context_counts
    j = (
        db.join(bigram_counts, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(k)))
        / (
            F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            + F.lit(float(k)) * F.col("v").cast("double")
        )
    )
    per_doc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.avg(logp).alias("avg_logp"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        round4(F.exp(-F.col("avg_logp"))).alias("ppl"),
    )


def ppl_band(ppl: Column, head_max: float, middle_max: float) -> Column:
    """CCNet head/middle/tail from fixed, config-shipped thresholds."""
    return (
        F.when(ppl <= F.lit(float(head_max)), "head")
        .when(ppl <= F.lit(float(middle_max)), "middle")
        .otherwise("tail")
    )


def lm_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    train_mod: int = 10,
    train_keep: int = 8,
    head_max: float = 100.0,
    middle_max: float = 1000.0,
) -> DataFrame:
    """End-to-end CCNet-style scoring: train on the deterministic corpus
    slice, score every document, band by fixed thresholds.

    Output: (doc_id, n_bigrams, n_oov, ppl, band).
    """
    c2, c1, vocab = train_bigram_lm(docs, train_mod, train_keep)
    scored = score_perplexity(docs, c2, c1, vocab, k=k)
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        "ppl",
        ppl_band(F.col("ppl"), head_max, middle_max).alias("band"),
    )


def lm_perplexity_adaptive(
    docs: DataFrame,
    k: float = 0.5,
    train_mod: int = 10,
    train_keep: int = 8,
    head_q: float = 1.0 / 3.0,
    middle_q: float = 2.0 / 3.0,
    cut_sample_rate: float = 1.0,
    stratum_col: str = "lang",
) -> DataFrame:
    """CCNet's *adaptive* banding: instead of config-shipped thresholds,
    compute the head/middle cut points as per-language perplexity
    percentiles over a deterministic hash sample of the scored corpus —
    the step CCNet itself runs once per language to produce the cutoffs
    it then ships (Wenzek et al. 2020, §4.3).

    Plan shape: the scored table feeds two consumers (the cutoff
    aggregation and the final banding join), so it is barriered with
    ``localCheckpoint(eager=False)`` — otherwise the whole three-shuffle
    LM pipeline re-executes per consumer. Cutoffs are computed on the
    md5 unit-hash sample (partition-independent, oracle-exact — see
    sampling.unit_hash), aggregated per stratum with Spark's exact
    ``percentile`` (linear interpolation == DuckDB ``quantile_cont``),
    and the resulting |langs|-row table is broadcast back. At 10^12
    rows pick ``cut_sample_rate`` so each language's sample fits one
    aggregation buffer (CCNet uses a sample for exactly this reason);
    the banding join side stays a broadcast at any corpus scale.

    Strata with an empty sample get no cutoffs and their docs are
    dropped by the inner join on both engines — at production rates a
    language that small has no business getting its own LM cutoffs.

    Output: (lang, doc_id, n_bigrams, n_oov, ppl, head_cut, middle_cut,
    band); cut points round4-floored on both engines before the band
    comparison so the boundary predicate sees identical 4-decimal values.
    """
    from readability_spark.operators.sampling import unit_hash

    c2, c1, vocab = train_bigram_lm(docs, train_mod, train_keep)
    scored = (
        score_perplexity(docs, c2, c1, vocab, k=k)
        .join(docs.select("doc_id", stratum_col), "doc_id")
        .localCheckpoint(eager=False)
    )
    sample = scored.filter(unit_hash("doc_id") < F.lit(float(cut_sample_rate)))
    cuts = sample.groupBy(stratum_col).agg(
        round4(F.expr(f"percentile(ppl, {head_q!r})")).alias("head_cut"),
        round4(F.expr(f"percentile(ppl, {middle_q!r})")).alias("middle_cut"),
    )
    banded = scored.join(F.broadcast(cuts), stratum_col)
    return banded.select(
        stratum_col,
        "doc_id",
        "n_bigrams",
        "n_oov",
        "ppl",
        "head_cut",
        "middle_cut",
        F.when(F.col("ppl") <= F.col("head_cut"), "head")
        .when(F.col("ppl") <= F.col("middle_cut"), "middle")
        .otherwise("tail")
        .alias("band"),
    )


def lm_mixture_em(
    docs_a: DataFrame,
    docs_b: DataFrame,
    docs_held: DataFrame,
    n_iter: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """EM-fitted interpolation weight between two unigram LMs — the
    classic domain-mixture estimator (Jelinek-Mercer interpolation fitted
    on held-out data): how much of the held-out corpus's distribution
    the A-domain explains vs the B-domain, the statistic behind
    importance-style mixture decisions (DSIR's cousin with a likelihood
    semantics).

        γ_λ(w) = λ·P_A(w) / (λ·P_A(w) + (1-λ)·P_B(w))
        λ'     = Σ_w cnt_held(w)·γ_λ(w) / N_held          (λ₀ = 0.5)

    P_A/P_B are Laplace-smoothed over the shared vocabulary. Determinism
    across engines: γ is quantized per DISTINCT token to an integer grid
    (floor(γ·10¹² + ½)) so the E-step sum is an exact bigint in any
    order; every double entering the chain (Laplace ratios, λ itself) is
    a correctly-rounded function of exact integers, so Spark and the SQL
    oracle produce IDENTICAL λ trajectories, not merely close ones.

    Scale shape: token counting is two map-side-combined aggs; the
    per-round E-step is ONE agg over the (distinct held-out token,
    cnt, P_A, P_B) table — a few hundred thousand rows for any real
    vocabulary, cached once; λ is a driver scalar per round (the same
    legitimate pattern as pagerank's dangling term). Output: one row per
    round (round, lam).
    """
    def tok_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias(name))
        )

    ca = tok_counts(docs_a, "ca")
    cb = tok_counts(docs_b, "cb")
    ch = tok_counts(docs_held, "ch")
    # ONE materialization for everything scalar and per-token: the full
    # outer join of the three distinct-token tables is vocabulary-sized,
    # and a single agg over it yields na, nb, n_held AND the shared-vocab
    # size v (tokens seen in A or B). The previous form ran four separate
    # driver jobs (sum ca, sum cb, vocab count, sum ch), each re-executing
    # its token-count aggregation from the raw corpus — measured 23.6s ->
    # 3.9s for the 5-round registry query at sf0.01 local[16], warm
    # session both sides. Identical λ trajectory: the scalars and
    # per-token counts are the same integers.
    full = (
        ca.join(cb, "tok", "full")
        .join(ch, "tok", "full")
        .select(
            "tok",
            F.col("ch"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .persist()
    )
    na, nb, n_held, v = full.agg(
        F.sum("ca"),
        F.sum("cb"),
        F.sum("ch"),
        F.sum((F.col("ca") + F.col("cb") > 0).cast("long")),
    ).first()
    na, nb, n_held, v = na or 0, nb or 0, n_held or 0, v or 0
    probs = full.filter(F.col("ch").isNotNull()).select(
        "ch",
        ((F.col("ca") + 1).cast("double") / float(na + v)).alias("pa"),
        ((F.col("cb") + 1).cast("double") / float(nb + v)).alias("pb"),
    )

    lam = 0.5
    rows = []
    for r in range(1, n_iter + 1):
        g = F.floor(
            (F.lit(lam) * F.col("pa"))
            / (F.lit(lam) * F.col("pa") + F.lit(1.0 - lam) * F.col("pb"))
            * 1e12
            + 0.5
        ).cast("long")
        s = probs.agg(F.sum(g * F.col("ch"))).first()[0]
        lam = float(s) / (1e12 * n_held)
        rows.append((r, lam))
    full.unpersist()
    spark = docs_a.sparkSession
    return spark.createDataFrame(rows, "round int, lam double").select(
        "round", (F.floor(F.col("lam") * 1e9 + 0.5) / 1e9).alias("lam")
    )
