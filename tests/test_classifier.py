"""Batch-GD logistic regression: the Spark training loop must reproduce an
independent numpy implementation of the same algorithm to float precision,
and the learned boundary must actually separate the synthetic labels."""

import math

import numpy as np
from pyspark.sql import functions as F

from readability_spark.operators.classifier import (
    domain_mix_report,
    quality_features,
    score_logreg,
    train_group_dro,
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


def _numpy_group_dro(X, y, dom, lr, eta, smoothing, n_iter):
    """Independent reference of the Group-DRO recurrence (same update
    order: alpha from current-model excess loss, then the alpha-weighted
    theta step)."""
    domains = sorted(set(dom))
    k = len(domains)
    alpha = {d: 1.0 / k for d in domains}
    w = np.zeros(X.shape[1] + 1)
    excess = {d: 0.0 for d in domains}
    for _ in range(n_iter):
        z = X @ w[:-1] + w[-1]
        loss = np.maximum(z, 0.0) - y * z + np.log1p(np.exp(-np.abs(z)))
        err = 1.0 / (1.0 + np.exp(-z)) - y
        by = {}
        for d in domains:
            m = dom == d
            by[d] = (
                loss[m].mean(),
                np.concatenate([(err[m, None] * X[m]).mean(axis=0), [err[m].mean()]]),
            )
        excess = {d: max(0.0, by[d][0] - math.log(2.0)) for d in domains}
        unnorm = {d: alpha[d] * math.exp(eta * excess[d]) for d in domains}
        tot = sum(unnorm[d] for d in domains)
        alpha = {
            d: (1.0 - smoothing) * unnorm[d] / tot + smoothing / k for d in domains
        }
        w -= lr * sum(alpha[d] * by[d][1] for d in domains)
    return w, alpha, excess


def test_group_dro_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "source", "domain"
    )
    feats = quality_features(docs, keep_cols=("domain",)).cache()
    rows = feats.orderBy("doc_id").collect()
    X = np.array([[r.x1, r.x2] for r in rows])
    y = np.array([r.y for r in rows])
    dom = np.array([r.domain for r in rows])
    w_s, a_s, e_s = train_group_dro(
        feats, lr=0.5, eta=4.0, smoothing=0.05, n_iter=8
    )
    w_n, a_n, e_n = _numpy_group_dro(X, y, dom, 0.5, 4.0, 0.05, 8)
    assert np.allclose(w_s, w_n, rtol=1e-9, atol=1e-12), (w_s, w_n)
    for d in a_n:
        assert a_s[d] == pytest_approx(a_n[d])
        assert e_s[d] == pytest_approx(e_n[d])


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-9, abs=1e-12)


def test_domain_mix_report_is_a_mixture(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "source", "domain"
    )
    feats = quality_features(docs, keep_cols=("domain",)).cache()
    smoothing, n_dom = 0.05, feats.select("domain").distinct().count()
    rows = domain_mix_report(
        feats, lr=0.5, eta=4.0, smoothing=smoothing, n_iter=8
    ).collect()
    assert len(rows) == n_dom
    total = sum(r.weight for r in rows)
    # round4 per weight: |sum - 1| bounded by n_dom * 5e-5
    assert abs(total - 1.0) <= n_dom * 5e-5, total
    floor_w = smoothing / n_dom
    for r in rows:
        assert r.weight >= floor_w - 5e-5, (r.domain, r.weight)
        assert r.excess_loss >= 0.0
        assert r.n_docs > 0


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


def test_group_dro_deterministic_across_partitionings(spark):
    """The round4-floored mixer outputs must be identical whatever the
    input partition layout (the avg aggregation's FP drift stays under
    the rounding floor on this corpus)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "source", "domain"
    )
    outs = []
    for parts in (1, 13):
        feats = quality_features(docs.repartition(parts), keep_cols=("domain",))
        rep = domain_mix_report(feats, lr=0.5, eta=4.0, smoothing=0.05, n_iter=8)
        outs.append({r.domain: (r.weight, r.excess_loss, r.n_docs) for r in rep.collect()})
    assert outs[0] == outs[1]
