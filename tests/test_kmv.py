"""KMV bottom-k sketch: Spark order statistics vs an independent pure
Python recomputation, exact-regime behavior, estimator error bounds,
and salt-count invariance of the two-phase sketch build."""

import hashlib

import pytest

from readability_spark.operators.kmv import (
    KMV_K,
    KMV_SPACE,
    kmv_distinct,
    kmv_set_ops,
    kmv_sketch,
)

pytestmark = pytest.mark.spark


def _h(item: str) -> int:
    return int(hashlib.md5(item.encode()).hexdigest()[:13], 16)


def _py_sketch(items, k=KMV_K):
    return sorted({_h(i) for i in items})[:k]


def _toks(spark, rows):
    """rows: list of (grp, item)."""
    return spark.createDataFrame(rows, "grp string, item string")


def test_sketch_matches_python_reference(spark):
    rows = [("a", f"tok{i}") for i in range(500)] + [
        ("b", f"tok{i}") for i in range(250, 900)
    ]
    got = {
        (r.grp, r.rk): r.v
        for r in kmv_sketch(_toks(spark, rows), "grp", "item").collect()
    }
    for grp, n0, n1 in [("a", 0, 500), ("b", 250, 900)]:
        ref = _py_sketch([f"tok{i}" for i in range(n0, n1)])
        assert len(ref) == KMV_K
        for rk, v in enumerate(ref, start=1):
            assert got[(grp, rk)] == v
    assert len(got) == 2 * KMV_K


def test_exact_regime_small_sets(spark):
    rows = [("a", f"x{i}") for i in range(40)] * 3 + [
        ("b", f"x{i}") for i in range(20, 50)
    ]
    sk = kmv_sketch(_toks(spark, rows), "grp", "item")
    dist = {r.grp: r for r in kmv_distinct(sk).collect()}
    assert dist["a"].n_rows == 40 and dist["a"].kmv_est == 40.0
    assert dist["b"].n_rows == 30 and dist["b"].kmv_est == 30.0
    ops = kmv_set_ops(sk).collect()
    assert len(ops) == 1
    r = ops[0]
    # |A∪B| = 50, |A∩B| = 20 exactly — sketches are exhaustive
    assert r.k_used == 50 and r.union_est == 50.0
    assert r.n_matches == 20 and r.inter_est == 20.0
    assert r.jaccard_est == round(20 / 50, 4)


def test_estimate_regime_error_bounds(spark):
    # two 4000-token vocabularies sharing 2000 tokens:
    # union = 6000, jaccard = 1/3, intersection = 2000
    rows = [("a", f"w{i}") for i in range(4000)] + [
        ("b", f"w{i}") for i in range(2000, 6000)
    ]
    sk = kmv_sketch(_toks(spark, rows), "grp", "item")
    dist = {r.grp: r for r in kmv_distinct(sk).collect()}
    for g in "ab":
        assert dist[g].n_rows == KMV_K
        assert abs(dist[g].kmv_est - 4000) / 4000 < 0.3
    r = kmv_set_ops(sk).collect()[0]
    assert r.k_used == KMV_K
    assert abs(r.union_est - 6000) / 6000 < 0.3
    assert abs(r.jaccard_est - 1 / 3) < 0.15
    assert abs(r.inter_est - 2000) / 2000 < 0.5


def test_salt_count_invariance(spark):
    rows = [("g", f"item{i}") for i in range(1000)]
    df = _toks(spark, rows)
    a = sorted(
        (r.rk, r.v) for r in kmv_sketch(df, "grp", "item", n_salts=1).collect()
    )
    b = sorted(
        (r.rk, r.v) for r in kmv_sketch(df, "grp", "item", n_salts=16).collect()
    )
    assert a == b and len(a) == KMV_K


def test_disjoint_sets_zero_intersection(spark):
    rows = [("a", f"l{i}") for i in range(3000)] + [
        ("b", f"r{i}") for i in range(3000)
    ]
    r = kmv_set_ops(kmv_sketch(_toks(spark, rows), "grp", "item")).collect()[0]
    # disjoint vocabularies: a shared hash requires an md5-prefix
    # collision, so the estimator must return exactly zero
    assert r.n_matches == 0 and r.jaccard_est == 0.0 and r.inter_est == 0.0
    assert abs(r.union_est - 6000) / 6000 < 0.3


def test_space_constant():
    assert KMV_SPACE == 16**13
