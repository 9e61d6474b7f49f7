"""Bigram-LM perplexity: the Spark pipeline must reproduce an independent
pure-python implementation of the same add-k model, and the bands must
behave (training-slice text scores lower than random-token text)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.lm import (
    lm_perplexity,
    score_perplexity,
    train_bigram_lm,
)

SF = "/root/testdata/sf0.001"


def _py_model(texts_by_id, train_mod=10, train_keep=8):
    c2, c1, vocab = Counter(), Counter(), set()
    for did, text in texts_by_id.items():
        if did % train_mod >= train_keep:
            continue
        toks = text.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    return c2, c1, len(vocab)


def _py_ppl(text, c2, c1, v, k=0.5):
    toks = text.split(" ")
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return None
    lp = [
        math.log((c2.get(p, 0) + k) / (c1.get(p[0], 0) + k * v)) for p in pairs
    ]
    ppl = math.exp(-sum(lp) / len(lp))
    return len(pairs), sum(1 for p in pairs if p not in c2), ppl


def test_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    c2, c1, v = _py_model(texts)
    got = {r.doc_id: r for r in lm_perplexity(docs).collect()}
    n_checked = 0
    for did, text in texts.items():
        exp = _py_ppl(text, c2, c1, v)
        if exp is None:
            assert did not in got
            continue
        n_bg, n_oov, ppl = exp
        r = got[did]
        assert r.n_bigrams == n_bg
        assert r.n_oov == n_oov
        assert r.ppl == pytest.approx(
            math.floor(ppl * 10000.0 + 0.5) / 10000.0, abs=1e-4
        ), (did, ppl, r.ppl)
        n_checked += 1
    assert n_checked == len(got) > 0


def test_train_slice_scores_below_shuffled_text(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    c2, c1, vocab = train_bigram_lm(docs)
    # same vocabulary, deterministically shuffled order -> bigrams the LM
    # never saw -> higher perplexity than the real corpus text
    shuffled = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.expr(
                "transform(split(text, ' '), (w, i) ->"
                " split(text, ' ')[int(abs(hash(w, i, doc_id)) % size(split(text, ' ')))])"
            ),
        ).alias("text"),
    )
    real = score_perplexity(docs, c2, c1, vocab).agg(F.avg("ppl")).first()[0]
    scr = score_perplexity(shuffled, c2, c1, vocab).agg(F.avg("ppl")).first()[0]
    assert real < scr, (real, scr)


def test_band_thresholds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = lm_perplexity(docs, head_max=100.0, middle_max=1000.0)
    rows = out.collect()
    for r in rows:
        want = "head" if r.ppl <= 100.0 else ("middle" if r.ppl <= 1000.0 else "tail")
        assert r.band == want, (r.doc_id, r.ppl, r.band)
