"""SemDeDup (Abbas et al. 2023): the Spark operator must reproduce an
independent pure-python implementation of the whole pipeline (seeded
centroids, quantized Lloyd iterations, within-cluster one-shot suppression)
exactly, keep the paper's most-marginal exemplar per duplicate group, and
broadcast the centroid table in the plan."""

import hashlib
import math

from readability_spark.operators.semdedup import semdedup

SF = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _planes(n, dim, seed=42):
    return [
        [_h32(f"{seed}:{p}:{j}") / 2147483648.0 - 1.0 for j in range(dim)]
        for p in range(n)
    ]


def _cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _py_semdedup(emb, n_clusters=4, threshold=0.92, lloyd_iters=2):
    """emb: dict vec_id -> list[float]. Returns {vec_id: (cell, cent_cos_r4,
    is_kept)} — the independent reference."""
    cents = _planes(n_clusters, len(next(iter(emb.values()))))

    def assign():
        out = {}
        for vid, v in emb.items():
            best = max(range(n_clusters), key=lambda c: (_cos(v, cents[c]), -c))
            out[vid] = best
        return out

    for _ in range(lloyd_iters):
        a = assign()
        by_cell = {}
        for vid, cell in a.items():
            by_cell.setdefault(cell, []).append(emb[vid])
        for cell, vecs in by_cell.items():
            cents[cell] = [
                math.floor(sum(col) / len(vecs) * 1e6 + 0.5) / 1e6
                for col in zip(*vecs)
            ]
    a = assign()
    cc = {vid: _cos(emb[vid], cents[cell]) for vid, cell in a.items()}
    out = {}
    for vid in emb:
        dropped = any(
            other != vid
            and a[other] == a[vid]
            and (cc[other], other) < (cc[vid], vid)
            and _cos(emb[vid], emb[other]) >= threshold
            for other in emb
        )
        out[vid] = (
            a[vid],
            math.floor(cc[vid] * 10000.0 + 0.5) / 10000.0,
            not dropped,
        )
    return out


def _demo_vectors():
    """8-dim vectors: a 3-member near-duplicate family (0, 1, 2), an exact
    pair (3, 4), and spread singletons — cosines inside a family > 0.92,
    across families well below."""
    base = [1.0, 0.5, 0.25, 0.0, 0.0, 0.25, 0.5, 1.0]
    return {
        0: base,
        1: [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)],
        2: [x + (0.02 if i == 3 else 0.0) for i, x in enumerate(base)],
        3: [0.0, 1.0, 0.0, -1.0, 0.5, 0.0, -0.5, 0.25],
        4: [0.0, 1.0, 0.0, -1.0, 0.5, 0.0, -0.5, 0.25],
        5: [-1.0, 0.25, 0.5, 0.75, -0.25, 1.0, 0.0, -0.5],
        6: [0.5, -0.5, 1.0, 0.0, -1.0, 0.25, 0.75, 0.0],
    }


def test_semdedup_matches_pure_python(spark):
    emb = _demo_vectors()
    df = spark.createDataFrame(
        [(k, v) for k, v in emb.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: (r.cell, r.cent_cos, r.is_kept)
        for r in semdedup(df, n_clusters=4).collect()
    }
    want = _py_semdedup(emb)
    assert got == want
    # the dup families actually exercised suppression
    assert sum(1 for _, _, kept in want.values() if not kept) >= 2


def test_semdedup_keeps_most_marginal_exemplar(spark):
    emb = _demo_vectors()
    df = spark.createDataFrame(
        [(k, v) for k, v in emb.items()], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in semdedup(df, n_clusters=4).collect()}
    fam = [rows[i] for i in (0, 1, 2)]
    if len({r.cell for r in fam}) == 1:
        kept = [r for r in fam if r.is_kept]
        assert len(kept) == 1
        # paper's rule: the survivor is the LOWEST-centroid-cosine member
        assert kept[0].cent_cos == min(r.cent_cos for r in fam)
    # the exact pair: exactly one survives (lower vec_id on tie)
    pair = [rows[i] for i in (3, 4)]
    assert [r.is_kept for r in pair] == [True, False]


def test_semdedup_covers_every_vector_once(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semdedup(df).collect()
    assert len(out) == df.count()
    assert len({r.vec_id for r in out}) == len(out)


def test_semdedup_plan_broadcasts_centroids(spark):
    from readability_spark.operators.semdedup import _assign
    from readability_spark.operators.similarity import (
        DEFAULT_PLANE_SEED,
        _infer_dim,
        seeded_centroids,
    )

    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    # the r4 scored-stage checkpoint truncates the final plan at a LogicalRDD,
    # so assert the centroid attach on the assignment subplan it hides:
    # no equi-key -> broadcast nested loop, never a shuffled cartesian
    cents = seeded_centroids(spark, 16, _infer_dim(df), DEFAULT_PLANE_SEED)
    aplan = _assign(df, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in aplan, aplan
    assert "CartesianProduct" not in aplan, aplan
    # and the end-to-end plan stays cartesian-free
    plan = semdedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_semdedup_giant_cluster_guard(spark):
    """VERDICT r3: one hot cluster must not become one task's c² pair
    block. Build a corpus where (nearly) everything lands in a single
    k-means cell, then assert (a) the salted join splits that cell across
    >1 salt slice, and (b) salting changes nothing about the answer."""
    from readability_spark.operators.semdedup import semdedup as _sd

    # 300 near-identical vectors (one dominant direction + per-id jitter)
    # collapse into one cell; jitter keeps cosines straddling the threshold
    rows = [
        (i, [1.0, 0.002 * (i % 7), 0.003 * (i % 5), 0.001 * (i % 11)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    st: dict = {}
    capped = _sd(df, n_clusters=4, cluster_cap=50, _stages=st)
    got = {(r.vec_id, r.cell, r.cent_cos, r.is_kept) for r in capped.collect()}
    slices = {r.cell: r.n_salt for r in st["cell_slices"].collect()}
    assert max(slices.values()) >= 6  # 300-member cell / cap 50
    # a cap larger than any cell = the unsalted pre-r4 behavior
    want = {
        (r.vec_id, r.cell, r.cent_cos, r.is_kept)
        for r in _sd(df, n_clusters=4, cluster_cap=10**9).collect()
    }
    assert got == want
    # and suppression actually happened (the guard wasn't vacuous)
    assert any(not kept for _, _, _, kept in got)
