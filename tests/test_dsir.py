"""DSIR importance resampling (Xie et al. 2023): the Spark operator must
reproduce an independent pure-python implementation exactly, and its plan
must broadcast the model and plan a top-k, not a global sort."""

import hashlib
import math

import pytest

from readability_spark.operators.dsir import (
    demo_raw,
    demo_target,
    dsir_select,
    hashed_ngram_counts,
)

SF = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_dsir(raw, target, k=5, n_buckets=512, alpha=0.1, seed=7):
    """raw/target: dict doc_id -> text. Returns [(doc_id, n_feats, logw,
    gkey, rank)] — the independent reference."""

    def feats(text):
        toks = text.lower().split(" ")
        grams = toks + [a + "_" + b for a, b in zip(toks, toks[1:])]
        out = {}
        for g in grams:
            b = _h32(g) % n_buckets
            out[b] = out.get(b, 0) + 1
        return out

    def model(corpus):
        counts = {}
        for text in corpus.values():
            for b, c in feats(text).items():
                counts[b] = counts.get(b, 0) + c
        tot = sum(counts.values())
        return {
            b: math.log((counts.get(b, 0) + alpha) / (tot + alpha * n_buckets))
            for b in range(n_buckets)
        }

    log_p, log_q = model(target), model(raw)
    scored = []
    for doc_id, text in raw.items():
        f = feats(text)
        logw = sum(c * (log_p[b] - log_q[b]) for b, c in f.items())
        u = (_h32(f"{seed}:{doc_id}") + 0.5) / 2**32
        gkey = logw + (-math.log(-math.log(u)))
        scored.append((doc_id, sum(f.values()), logw, gkey))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return [
        (doc_id, n, round4(logw), round4(gkey), i + 1)
        for i, (doc_id, n, logw, gkey) in enumerate(scored[:k])
    ]


def round4(x):
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def test_dsir_matches_pure_python(spark):
    raw = {
        1: "the cat sat on the mat",
        2: "stock markets rallied on tuesday after the announcement",
        3: "the cat chased the dog around the garden",
        4: "click here to enable javascript and accept cookies now",
        5: "a cat and a dog lived in the garden",
    }
    target = {
        10: "the cat slept in the garden",
        20: "the dog and the cat played on the mat",
    }
    raw_df = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tgt_df = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    got = [
        (r.doc_id, r.n_feats, r.logw, r.gkey, r.rank)
        for r in dsir_select(raw_df, tgt_df, k=5).collect()
    ]
    want = _py_dsir(raw, target, k=5)
    assert got == want
    # direction sanity: cat/garden docs outscore the finance/banner docs on
    # raw logw (target is about cats in gardens)
    logw = {r[0]: r[2] for r in want}
    assert min(logw[1], logw[3], logw[5]) > max(logw[2], logw[4])


def test_dsir_features_count(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    total = (
        hashed_ngram_counts(df)
        .groupBy()
        .sum("cnt")
        .collect()[0][0]
    )
    assert total == 5  # 3 unigrams + 2 bigrams


def test_dsir_plan_broadcasts_model_and_takes_topk(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = dsir_select(demo_raw(docs), demo_target(docs), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
