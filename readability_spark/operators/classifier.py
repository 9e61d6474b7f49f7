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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_features(docs: DataFrame, threshold: float = 1.4) -> DataFrame:
    """Deterministic (doc_id, x1, x2, y) training frame from the documents
    table: x1 = whitespace-token count / 100, x2 = (doc_id % 10) / 10 (a
    deterministic pseudo-feature, exact in any engine), and the label is
    the linear rule x1 + 2*x2 > threshold — linearly separable by
    construction, so gradient descent demonstrably learns it."""
    n_tok = F.size(F.split("text", " ")).cast("double")
    x1 = n_tok / F.lit(100.0)
    x2 = (F.col("doc_id") % 10).cast("double") / F.lit(10.0)
    return docs.select(
        "doc_id",
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
