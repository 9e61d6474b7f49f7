"""Batch-GD logistic regression: the Spark training loop must reproduce an
independent numpy implementation of the same algorithm to float precision,
and the learned boundary must actually separate the synthetic labels."""

import math

import numpy as np
from pyspark.sql import functions as F

from readability_spark.operators.classifier import (
    quality_features,
    score_logreg,
    train_logreg,
)

SF = "/root/testdata/sf0.001"


def _numpy_logreg(X, y, lr=4.0, n_iter=16):
    w = np.zeros(X.shape[1] + 1)
    for _ in range(n_iter):
        z = X @ w[:-1] + w[-1]
        err = 1.0 / (1.0 + np.exp(-z)) - y
        grad = np.concatenate([(err[:, None] * X).mean(axis=0), [err.mean()]])
        w -= lr * grad
    return w


def test_train_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = quality_features(docs).cache()
    rows = feats.orderBy("doc_id").collect()
    X = np.array([[r.x1, r.x2] for r in rows])
    y = np.array([r.y for r in rows])
    w_spark = train_logreg(feats, lr=4.0, n_iter=16)
    w_np = _numpy_logreg(X, y)
    assert np.allclose(w_spark, w_np, rtol=1e-9, atol=1e-12), (w_spark, w_np)


def test_gradient_actually_learns_the_rule(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = quality_features(docs).cache()
    w = train_logreg(feats, lr=4.0, n_iter=16)
    scored = score_logreg(feats, w)
    n = scored.count()
    acc = scored.filter("correct").count() / n
    # separable-by-construction labels: 16 rounds must already beat the
    # majority-class baseline by a wide margin
    base = max(
        r.cnt for r in feats.groupBy("y").agg(F.count("*").alias("cnt")).collect()
    ) / n
    assert acc > max(0.75, base + 0.05), (acc, base)
    # and the learned direction matches the generating rule x1 + 2*x2
    assert w[0] > 0 and w[1] > 0 and w[1] > w[0], w


def test_score_is_round4_sigmoid(spark):
    feats = spark.createDataFrame(
        [(1, 0.5, 0.2, 1.0), (2, 0.1, 0.9, 0.0)], "doc_id long, x1 double, x2 double, y double"
    )
    w = [0.3, -0.7, 0.05]
    got = {r.doc_id: r for r in score_logreg(feats, w).collect()}
    for did, x1, x2, y in [(1, 0.5, 0.2, 1.0), (2, 0.1, 0.9, 0.0)]:
        p = 1.0 / (1.0 + math.exp(-(w[2] + w[0] * x1 + w[1] * x2)))
        assert got[did].p == math.floor(p * 10000.0 + 0.5) / 10000.0
        assert got[did].yhat == (1.0 if p > 0.5 else 0.0)
        assert got[did].correct == (got[did].yhat == y)
