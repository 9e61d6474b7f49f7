"""Tests for the round-4 mining/planning additions: Efraimidis–Spirakis
weighted sampling, Artetxe–Schwenk bitext margin mining, and the
MinHash-LSH banding planner."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import sf_dir


# ---------------------------------------------------------------------------
# weighted_sample (A-ES)
# ---------------------------------------------------------------------------


def _brute_aes(rows, k):
    """The reference selection computed row-at-a-time in Python: same md5
    unit hash, same clamped -ln(u)/w key, same quantization+tiebreak."""
    import hashlib

    keyed = []
    for doc_id, w in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = max(h / 2.0**32, 1.0 / 2.0**32)
        ek = math.floor(-math.log(u) / w * 1e9)
        keyed.append((ek, doc_id, w))
    keyed.sort()
    return [(d, int(w), i + 1) for i, (_, d, w) in enumerate(keyed[:k])]


def test_weighted_sample_matches_bruteforce(spark):
    from readability_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir()}/documents.parquet")
    got = {
        (r.doc_id, r.w, r.rk)
        for r in weighted_sample(docs, k=50).collect()
    }
    base = [
        (r.doc_id, len(r.text.split(" ")))
        for r in docs.select("doc_id", "text").collect()
        if len(r.text.split(" ")) > 0
    ]
    assert got == set(_brute_aes(base, 50))


def test_weighted_sample_partition_independent(spark):
    from readability_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir()}/documents.parquet")
    a = sorted(map(tuple, weighted_sample(docs, k=30).collect()))
    b = sorted(map(tuple, weighted_sample(docs.repartition(7), k=30).collect()))
    assert a == b


def test_weighted_sample_weight_proportional(spark):
    """A doc with 100x the weight of the rest should land in a small
    sample far more often than uniform — check the heavy doc is selected
    at k much smaller than n."""
    from readability_spark.operators.sampling import weighted_sample

    rows = [Row(doc_id=i, text=("w " * (2000 if i == 7 else 20)).strip()) for i in range(200)]
    df = spark.createDataFrame(rows)
    picked = {r.doc_id for r in weighted_sample(df, k=20).collect()}
    assert 7 in picked


def test_weighted_sample_plan_has_no_full_sort(spark):
    """orderBy().limit(k) must plan as TakeOrderedAndProject, never a
    global Sort."""
    from readability_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir()}/documents.parquet")
    plan = weighted_sample(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# bitext margin mining
# ---------------------------------------------------------------------------


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=lab) for i, (v, lab) in enumerate(vecs)]
    )


def test_bitext_margin_demotes_hub(spark):
    """A hub target that scores mediocre-high against EVERY source loses
    to a specific target under the margin, even when its raw cosine ties:
    the hub's own dense neighborhood inflates its normalizer."""
    from readability_spark.operators.bitext import bitext_margin_pairs

    # label 0 = sources, label 1 = targets. Target 'hub' ~0.8 cosine with
    # all sources; target 'match0' ~0.9 with source 0 only.
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.randn(6, 8)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    srcs = [(list(base[i]), 0) for i in range(4)]
    hub = np.mean(base[:4], axis=0)
    hub /= np.linalg.norm(hub)
    match0 = 0.95 * base[0] + 0.05 * base[5]
    match0 /= np.linalg.norm(match0)
    tgts = [(list(hub), 1), (list(match0), 1)]
    emb = _mk_emb(spark, srcs + tgts)
    out = {r.src_id: r for r in bitext_margin_pairs(emb, k=2, threshold=0.0, candidates="cross").collect()}
    assert out[0].tgt_id == 5  # match0 (vec_id 5) beats the hub (vec_id 4)


def test_bitext_mutual_flag(spark):
    """Two exactly-aligned pairs are mutual; everything rides the same
    deterministic tiebreaks."""
    from readability_spark.operators.bitext import bitext_margin_pairs

    v = [
        ([1.0, 0.0, 0.0, 0.0], 0),
        ([0.0, 1.0, 0.0, 0.0], 0),
        ([0.9, 0.1, 0.0, 0.1], 1),
        ([0.1, 0.9, 0.0, 0.1], 1),
    ]
    out = bitext_margin_pairs(_mk_emb(spark, v), k=1, threshold=0.0, candidates="cross").collect()
    pairs = {(r.src_id, r.tgt_id): r.mutual for r in out}
    assert pairs == {(0, 2): True, (1, 3): True}


def test_bitext_threshold_filters(spark):
    from readability_spark.operators.bitext import bitext_margin_pairs

    emb = spark.read.parquet(f"{sf_dir()}/embeddings.parquet")
    lo = bitext_margin_pairs(emb, k=4, threshold=0.0).count()
    hi = bitext_margin_pairs(emb, k=4, threshold=1.05).count()
    assert hi < lo


# ---------------------------------------------------------------------------
# LSH banding planner
# ---------------------------------------------------------------------------


def test_lsh_plan_matches_python_scurve(spark):
    """Every (fp, fn) mass equals the plain-Python S-curve sum under the
    identical quantization."""
    from readability_spark.operators.planner import lsh_parameter_plan

    got = {
        (r.bands, r.rows_per_band): (r.fp_mass, r.fn_mass)
        for r in lsh_parameter_plan(spark, perms=32, threshold=0.7).collect()
    }
    for (b, r), (fp, fn) in got.items():
        assert b * r == 32
        fpq = fnq = 0
        for i in range(1, 20):
            s = i / 20.0
            p = 1.0 - (1.0 - s**r) ** b
            if i < 14:
                fpq += math.floor(p * 1e6)
            else:
                fnq += 1_000_000 - math.floor(p * 1e6)
        assert fp == pytest.approx(fpq / 1e6)
        assert fn == pytest.approx(fnq / 1e6)


def test_lsh_plan_default_banding_is_optimal(spark):
    """The repo's production banding (16 bands x 8 rows at threshold 0.7)
    sits at the planner's objective minimum for a 128-perm budget."""
    from readability_spark.operators.planner import lsh_parameter_plan

    rows = lsh_parameter_plan(spark, perms=128, threshold=0.7).collect()
    best = min(rows, key=lambda r: r.objective)
    assert (best.bands, best.rows_per_band) == (16, 8)


def test_bitext_shortlist_recall_measured(spark):
    """The LSH-shortlist mode's mined pairs vs the exhaustive mode's, on
    the deliberately diffuse synthetic corpus (best cross-side cosine
    ~0.35, per-plane agreement p ~0.61 — the hard end for hyperplane
    LSH). Deterministic (seeded planes, fixed corpus): measured overlap
    138/230 = 0.600 at sf0.001, 120/217 = 0.553 at sf0.01, 539/931 =
    0.579 at sf0.1 — right where 1-(1-p^6)^16 predicts. Production
    bitext embeddings (aligned cosine ~0.8+, p ~0.85+) run b=16+ at
    near-exhaustive recall; this floor pins that the sandbox defaults
    don't silently collapse."""
    from readability_spark.operators.bitext import bitext_margin_pairs

    emb = spark.read.parquet(f"{sf_dir()}/embeddings.parquet")
    cross = {(r.src_id, r.tgt_id)
             for r in bitext_margin_pairs(emb, candidates="cross").collect()}
    lsh = {(r.src_id, r.tgt_id) for r in bitext_margin_pairs(emb).collect()}
    recall = len(cross & lsh) / len(cross)
    assert recall >= 0.5, f"shortlist recall collapsed: {recall:.3f}"
    # pair VOLUME stays comparable: margins re-rank within the shortlist,
    # so the miner still yields ~one pair per covered source vector
    assert 0.8 <= len(lsh) / len(cross) <= 1.2
