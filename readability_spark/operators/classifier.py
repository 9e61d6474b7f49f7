"""Distributed quality-classifier training: batch-gradient logistic
regression over document features.

The CCNet / fastText-style pipeline step the quality signals in
``operators/textstats.py`` feed: train a linear classifier that separates
wanted from unwanted documents, then score the whole corpus with it. This
module implements the training loop itself as Spark aggregations —
full-batch gradient descent, the same shape MLlib's own linear models use —
so the engine covers iterative ML-style algorithms beyond graph power
iteration (``operators/graph.py``).

Per iteration: one map-side-combined aggregation computes the exact batch
gradient ``avg((sigmoid(w.x) - y) * x_j)`` per feature, the driver collects
the d+1 scalars (a few doubles — NOT a dataset collect; this is the
standard driver-side reduce every distributed GD does, including MLlib),
updates the weight vector, and embeds it as literals in the next
iteration's plan. Scoring is a pure projection with the final weights.

Scale shape: each iteration is one scan + one tree-reduced aggregation of
d+1 doubles — no shuffle wider than the aggregation's partial rows, no
state on any single task, nothing driver-side but the weight vector.
Cache the (tiny, numeric) feature frame to avoid re-deriving features from
text each round; at 10^12 docs the cached projection is doc_id + d doubles.
Fixed iteration count (no convergence probe) keeps the computation
engine-reproducible — the DuckDB oracle unrolls the identical rounds as
CTEs (same trick as the PageRank oracle).

Determinism note: double summation order differs across engines/partitions;
errors are ~1e-15 relative per round and the outputs are round4-floored,
the same accepted tolerance as PageRank's.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_features(
    docs: DataFrame, threshold: float = 1.4, keep_cols: tuple = ()
) -> DataFrame:
    """Deterministic (doc_id, x1, x2, y) training frame from the documents
    table: x1 = whitespace-token count / 100, x2 = (doc_id % 10) / 10 (a
    deterministic pseudo-feature, exact in any engine), and the label is
    the linear rule x1 + 2*x2 > threshold — linearly separable by
    construction, so gradient descent demonstrably learns it.
    ``keep_cols`` carries extra columns (e.g. the domain) through."""
    n_tok = F.size(F.split("text", " ")).cast("double")
    x1 = n_tok / F.lit(100.0)
    x2 = (F.col("doc_id") % 10).cast("double") / F.lit(10.0)
    return docs.select(
        "doc_id",
        *keep_cols,
        x1.alias("x1"),
        x2.alias("x2"),
        F.when(x1 + F.lit(2.0) * x2 > F.lit(float(threshold)), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def train_logreg(
    feats: DataFrame,
    lr: float = 4.0,
    n_iter: int = 16,
    feature_cols: tuple = ("x1", "x2"),
    label_col: str = "y",
) -> list:
    """Full-batch gradient descent from w = 0; returns the weight list
    [w_1..w_d, bias] after ``n_iter`` rounds.

    Gradient: avg((sigmoid(w.x + b) - y) * x_j) per feature plus the bias
    term; update w -= lr * grad. One aggregation job per round collecting
    d+1 doubles — the only driver-side data in the loop.
    """
    w = [0.0] * len(feature_cols) + [0.0]
    for _ in range(n_iter):
        z = F.lit(w[-1])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c)
        err = _sigmoid(z) - F.col(label_col)
        aggs = [F.avg(err * F.col(c)).alias(f"g{j}") for j, c in enumerate(feature_cols)]
        aggs.append(F.avg(err).alias("gb"))
        row = feats.agg(*aggs).collect()[0]
        for j in range(len(feature_cols)):
            w[j] -= lr * row[f"g{j}"]
        w[-1] -= lr * row["gb"]
    return w


def _stable_logloss(z: Column, y: Column) -> Column:
    """Numerically stable binary cross-entropy
    ``max(z,0) - y*z + ln(1 + exp(-|z|))``: never forms log(0) or 0*inf
    even when sigmoid(z) rounds to exactly 0.0/1.0 in doubles, and the
    same closed form is expressible verbatim in the DuckDB oracle."""
    return (
        F.greatest(z, F.lit(0.0)) - y * z + F.log(F.lit(1.0) + F.exp(-F.abs(z)))
    )


def train_group_dro(
    feats: DataFrame,
    domain_col: str = "domain",
    lr: float = 2.0,
    eta: float = 0.5,
    smoothing: float = 0.1,
    n_iter: int = 8,
    feature_cols: tuple = ("x1", "x2"),
    label_col: str = "y",
    baseline: float = math.log(2.0),
) -> tuple:
    """DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429):
    train the proxy classifier with Group DRO, maintaining a weight alpha_k
    per data domain updated by exponentiated gradient on that domain's
    clipped excess loss, while the model follows the alpha-weighted
    gradient. Domains the proxy finds hard (high excess loss vs the
    trivial-model baseline ln 2) are up-weighted — the mixture a training
    run should oversample.

    Per iteration: ONE map-side-combined ``groupBy(domain)`` aggregation
    computes every domain's avg loss and avg gradient components — K x
    (d+2) doubles collected driver-side (K = #domains, small by contract;
    this is the same legitimate driver reduce as :func:`train_logreg`).
    The driver then updates alpha (multiplicative weights, normalized,
    uniform-smoothed) and the parameters (theta -= lr * sum_k alpha_k *
    grad_k), embedding both as literals in the next round's plan.

    Scale shape: each round is one scan of the cached numeric feature
    frame + one K-group aggregation — no shuffle wider than K rows of
    partial aggregates, no per-domain data movement, nothing driver-side
    but K+d scalars. At 10^12 docs with ~30 domains this is exactly the
    DoReMi recipe's cost profile.

    Returns ``(weights, alpha, excess)``: the final parameter list
    [w_1..w_d, bias], the {domain: mixture weight} dict, and the
    {domain: clipped excess loss} used for the final alpha update.
    """
    domains = sorted(
        r[0] for r in feats.select(domain_col).distinct().collect()
    )
    k = len(domains)
    alpha = {d: 1.0 / k for d in domains}
    w = [0.0] * (len(feature_cols) + 1)
    excess = {d: 0.0 for d in domains}
    for _ in range(n_iter):
        z = F.lit(w[-1])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c)
        err = _sigmoid(z) - F.col(label_col)
        aggs = [F.avg(_stable_logloss(z, F.col(label_col))).alias("l")]
        aggs += [
            F.avg(err * F.col(c)).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
        aggs.append(F.avg(err).alias("gb"))
        by = {
            r[domain_col]: r
            for r in feats.groupBy(domain_col).agg(*aggs).collect()
        }
        excess = {d: max(0.0, by[d]["l"] - baseline) for d in domains}
        unnorm = {d: alpha[d] * math.exp(eta * excess[d]) for d in domains}
        tot = sum(unnorm[d] for d in domains)
        alpha = {
            d: (1.0 - smoothing) * unnorm[d] / tot + smoothing / k
            for d in domains
        }
        for j in range(len(feature_cols)):
            w[j] -= lr * sum(alpha[d] * by[d][f"g{j}"] for d in domains)
        w[-1] -= lr * sum(alpha[d] * by[d]["gb"] for d in domains)
    return w, alpha, excess


def domain_mix_report(
    feats: DataFrame, domain_col: str = "domain", **kwargs
) -> DataFrame:
    """Run :func:`train_group_dro` and emit one row per domain:
    (domain, n_docs, weight, excess_loss) — the resampling mixture a
    downstream training job consumes. The weight/excess columns are a
    literal when-chain over the K driver-held values (pure projection;
    no extra join)."""
    _, alpha, excess = train_group_dro(feats, domain_col=domain_col, **kwargs)
    wcol, ecol = F.lit(None).cast("double"), F.lit(None).cast("double")
    for d in alpha:
        wcol = F.when(F.col(domain_col) == d, F.lit(alpha[d])).otherwise(wcol)
        ecol = F.when(F.col(domain_col) == d, F.lit(excess[d])).otherwise(ecol)
    return (
        feats.groupBy(domain_col)
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            domain_col,
            "n_docs",
            round4(wcol).alias("weight"),
            round4(ecol).alias("excess_loss"),
        )
    )


def score_logreg(
    feats: DataFrame,
    weights: list,
    feature_cols: tuple = ("x1", "x2"),
    label_col: str = "y",
    decision: float = 0.5,
) -> DataFrame:
    """Pure-projection scoring with trained weights:
    (doc_id, y, p, yhat, correct) — p round4-floored."""
    z = F.lit(weights[-1])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j]) * F.col(c)
    p = _sigmoid(z)
    yhat = F.when(p > F.lit(float(decision)), 1.0).otherwise(0.0)
    return feats.select(
        "doc_id",
        label_col,
        round4(p).alias("p"),
        yhat.alias("yhat"),
        (yhat == F.col(label_col)).alias("correct"),
    )


def calibration_report(scored: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability table for a scored classifier frame (the standard
    calibration diagnostic: Niculescu-Mizil & Caruana 2005): bucket
    predictions into ``n_bins`` equal-width probability bins and compare
    each bin's mean predicted p against its empirical positive rate —
    the per-bin |gap| is what ECE sums.

    Determinism: ``p`` arrives round4-floored (score_logreg), so the bin
    edge expression floor(p * n_bins) sees the identical double in both
    engines; the bin AGGREGATES are computed on exact integers (p
    re-quantized to p*1e4 as bigint, y as 0/1 bigint) so partial-sum
    order can never produce a cross-engine ulp — the same
    quantize-before-sum trick as the LSH planner's masses.

    Scale shape: one map-side-combined groupBy over n_bins keys; the
    report is n_bins rows no matter the corpus size.
    """
    from readability_spark.operators.dedup import round4

    p = F.col("p")
    bin_ = F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1))
    p_q = F.floor(p * 10000.0 + 0.5).cast("long")
    binned = scored.select(
        bin_.alias("bin"),
        p_q.alias("p_q"),
        F.col("y").cast("long").alias("y1"),
    )
    n = F.count(F.lit(1))
    sum_pq = F.sum("p_q")
    sum_y = F.sum("y1")
    return (
        binned.groupBy("bin")
        .agg(
            n.alias("n"),
            round4(sum_pq / (10000.0 * n)).alias("mean_p"),
            round4(sum_y.cast("double") / n).alias("pos_rate"),
            round4(F.abs(sum_pq / (10000.0 * n) - sum_y.cast("double") / n)).alias(
                "gap"
            ),
        )
        .select("bin", "n", "mean_p", "pos_rate", "gap")
    )
