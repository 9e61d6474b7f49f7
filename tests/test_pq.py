"""Product quantization: codebook/code invariants, recall vs exact L2
(monotone in shortlist size, exact at full coverage), and the
exact-duplicate guarantee."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.pq import (
    PQ_K,
    PQ_M,
    _pq_assign,
    pq_adc_topk,
    pq_subvectors,
    pq_train,
)
from readability_spark.operators.similarity import load_embeddings

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _exact_l2_sets(spark, emb, n_queries=5, k=10):
    # rerank over the full table IS the exact search
    return _topk_sets(pq_adc_topk(emb, n_queries=n_queries, k=k, rerank=10**9))


def _avg_recall(exact, approx):
    return sum(
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)


def test_codebook_and_code_invariants(spark):
    emb = load_embeddings(spark, SF)
    cb = pq_train(emb)
    rows = cb.collect()
    assert len(rows) == PQ_M * PQ_K
    dsub = 64 // PQ_M
    from readability_spark.operators.pq import pq_init_codebooks

    init = {
        (r.sub, r.code_id): [float(c) for c in r.cw]
        for r in pq_init_codebooks(spark, 64).collect()
    }
    trained_per_sub = {}
    for r in rows:
        assert 0 <= r.sub < PQ_M and 0 <= r.code_id < PQ_K
        assert len(r.cw) == dsub
        # a codeword is either a quantized Lloyd mean (1e-6 grid) or the
        # untouched seeded initial vector (its cell stayed empty —
        # expected for most cells: the data cloud is concentrated, the
        # uniform seeds are not, so few seeds capture points)
        cw = [float(c) for c in r.cw]
        on_grid = all(abs(c * 1e6 - round(c * 1e6)) < 1e-3 for c in cw)
        if on_grid:
            trained_per_sub[r.sub] = trained_per_sub.get(r.sub, 0) + 1
        else:
            assert cw == init[(r.sub, r.code_id)]
    # training moved at least a handful of codes in every subspace
    assert all(trained_per_sub.get(s, 0) >= 2 for s in range(PQ_M)), trained_per_sub
    codes = _pq_assign(pq_subvectors(emb), cb)
    n = emb.count()
    assert codes.count() == n * PQ_M
    agg = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi")
    ).collect()[0]
    assert 0 <= agg.lo and agg.hi < PQ_K


def test_recall_monotone_and_exact_at_full_rerank(spark):
    emb = load_embeddings(spark, SF)
    n = emb.count()
    exact = _exact_l2_sets(spark, emb)
    r_small = _avg_recall(exact, _topk_sets(pq_adc_topk(emb, rerank=25)))
    r_mid = _avg_recall(exact, _topk_sets(pq_adc_topk(emb, rerank=100)))
    r_full = _avg_recall(exact, _topk_sets(pq_adc_topk(emb, rerank=n)))
    assert r_full == 1.0
    assert r_small <= r_full and r_mid <= r_full
    # measured ~0.7 at rerank=100 on this distance-concentrated
    # (worst-case) synthetic corpus; floor leaves noise margin
    assert r_mid >= 0.5, (r_small, r_mid, r_full)


def test_pure_adc_path_shape(spark):
    emb = load_embeddings(spark, SF)
    rows = pq_adc_topk(emb, n_queries=3, k=10, rerank=0).collect()
    per = {}
    for r in rows:
        per.setdefault(r.query_id, []).append(r.rank)
    assert set(per) == {0, 1, 2}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 11))


def test_exact_duplicate_wins_rank_one(spark):
    emb = load_embeddings(spark, SF)
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(10_000_000).alias("vec_id"), "embedding"
    )
    rows = pq_adc_topk(
        emb.select("vec_id", "embedding").unionByName(dup), n_queries=1, k=5
    ).collect()
    top = [r for r in rows if r.rank == 1][0]
    # the exact copy shares every code with the query, so it tops the
    # ADC shortlist and reranks to distance zero
    assert top.vec_id == 10_000_000 and top.d2_micro == 0
