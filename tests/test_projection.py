"""JL projection: numpy parity, the distance-preservation property that
justifies it, and the zero-shuffle plan."""

import math
import random

import numpy as np
from pyspark.sql import functions as F

from readability_spark.operators.projection import jl_project, jl_signs


def _vecs(n, dim, seed=3):
    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def test_jl_project_matches_numpy(spark):
    dim, k = 32, 8
    vecs = _vecs(50, dim)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: [r[f"p{j:02d}"] for j in range(k)]
        for r in jl_project(df, "embedding", in_dim=dim, out_dim=k).collect()
    }
    R = np.array(jl_signs(dim, k), dtype=float)  # k x dim
    for i, v in enumerate(vecs):
        want = (R @ np.array(v)) / math.sqrt(k)
        assert np.allclose(got[i], want, atol=1e-9)


def test_jl_preserves_pairwise_distances_on_average(spark):
    dim, k = 64, 16
    vecs = _vecs(80, dim, seed=9)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    rows = jl_project(df, "embedding", in_dim=dim, out_dim=k).collect()
    proj = {r["vec_id"]: np.array([r[f"p{j:02d}"] for j in range(k)]) for r in rows}
    orig = {i: np.array(v) for i, v in enumerate(vecs)}
    ratios = []
    rng = random.Random(4)
    for _ in range(300):
        a, b = rng.sample(range(80), 2)
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b])
        ratios.append(d1 / d0)
    # unbiased in expectation; mean ratio near 1 with sub-20% spread at k=16
    assert 0.9 < float(np.mean(ratios)) < 1.1
    assert float(np.std(ratios)) < 0.3


def test_jl_project_zero_shuffles(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    plan = jl_project(df, "embedding", 64, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
