"""Bigram-LM perplexity: the Spark pipeline must reproduce an independent
pure-python implementation of the same add-k model, and the bands must
behave (training-slice text scores lower than random-token text)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.lm import (
    lm_perplexity,
    lm_perplexity_adaptive,
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


def test_adaptive_cuts_are_per_language_percentiles(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = lm_perplexity_adaptive(docs, cut_sample_rate=1.0).collect()
    assert out
    # independent per-language linear-interpolation percentiles over the
    # full scored set (rate=1.0 -> the sample is everything)
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)

    def pct(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo = math.floor(pos)
        hi = min(lo + 1, len(vals) - 1)
        raw = vals[lo] + (pos - lo) * (vals[hi] - vals[lo])
        return math.floor(raw * 10000.0 + 0.5) / 10000.0

    for lang, rows in by_lang.items():
        ppls = [r.ppl for r in rows]
        head = pct(ppls, 1.0 / 3.0)
        mid = pct(ppls, 2.0 / 3.0)
        for r in rows:
            assert r.head_cut == pytest.approx(head, abs=1e-9), (lang, r)
            assert r.middle_cut == pytest.approx(mid, abs=1e-9), (lang, r)
            want = (
                "head"
                if r.ppl <= r.head_cut
                else ("middle" if r.ppl <= r.middle_cut else "tail")
            )
            assert r.band == want, (r.doc_id, r.ppl, r.band)
    # all three bands populated for the biggest language
    biggest = max(by_lang.values(), key=len)
    assert {r.band for r in biggest} == {"head", "middle", "tail"}


def test_adaptive_sampled_cuts_subset(spark):
    # rate<1: cutoffs come from the hash sample only, but every scored doc
    # in a sampled language is still banded
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = lm_perplexity_adaptive(docs, cut_sample_rate=1.0)
    sampled = lm_perplexity_adaptive(docs, cut_sample_rate=0.5)
    n_full = full.count()
    n_sampled = sampled.count()
    # languages whose sample is empty drop out; everything else is banded
    assert 0 < n_sampled <= n_full
    langs = {r.lang for r in sampled.select("lang").distinct().collect()}
    per_lang_full = {r["lang"]: r["count"] for r in full.groupBy("lang").count().collect()}
    per_lang_s = {r["lang"]: r["count"] for r in sampled.groupBy("lang").count().collect()}
    for lang in langs:
        assert per_lang_s[lang] == per_lang_full[lang]


def test_band_thresholds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = lm_perplexity(docs, head_max=100.0, middle_max=1000.0)
    rows = out.collect()
    for r in rows:
        want = "head" if r.ppl <= 100.0 else ("middle" if r.ppl <= 1000.0 else "tail")
        assert r.band == want, (r.doc_id, r.ppl, r.band)


def test_lm_mixture_em_matches_python_reference(spark):
    from collections import Counter

    from readability_spark.operators.lm import lm_mixture_em

    a_txt = ["spark shuffle join hash", "join scan filter hash spark"]
    b_txt = ["poem river moon light", "moon river song light poem"]
    h_txt = ["spark join river", "hash moon scan light"]

    def em_py(n_iter=5):
        ca, cb = Counter(), Counter()
        for t in a_txt:
            ca.update(t.split())
        for t in b_txt:
            cb.update(t.split())
        ch = Counter()
        for t in h_txt:
            ch.update(t.split())
        vocab = set(ca) | set(cb)
        na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
        nh = sum(ch.values())
        lam, out = 0.5, []
        for r in range(1, n_iter + 1):
            s = 0
            for tok, cnt in ch.items():
                pa = (ca.get(tok, 0) + 1) / float(na + v)
                pb = (cb.get(tok, 0) + 1) / float(nb + v)
                g = int((lam * pa / (lam * pa + (1.0 - lam) * pb)) * 1e12 + 0.5)
                s += g * cnt
            lam = float(s) / (1e12 * nh)
            out.append((r, int(lam * 1e9 + 0.5) / 1e9))
        return out

    mk = lambda txts: spark.createDataFrame([(t,) for t in txts], "text string")
    got = sorted(
        (r.round, r.lam)
        for r in lm_mixture_em(mk(a_txt), mk(b_txt), mk(h_txt), n_iter=5).collect()
    )
    assert got == em_py()
    # the held-out mix leans toward whichever domain explains it; with a
    # 50/50 blend λ should stay interior and move monotonically from 0.5
    lams = [l for _, l in got]
    assert all(0.0 < l < 1.0 for l in lams)
