"""Pile/DoReMi-style corpus mixing: the Spark operator must reproduce an
independent pure-python implementation (epoch replication + fractional
hash thinning), hit the target composition in expectation, and broadcast
the rate table."""

import hashlib

from readability_spark.operators.sampling import mix_corpus


def _u(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32


def _py_mix(docs, weights, total):
    """docs: list of (doc_id, source). Returns sorted (doc_id, source,
    epoch, n_copies) rows."""
    wsum = sum(weights.values())
    counts = {}
    for _, s in docs:
        counts[s] = counts.get(s, 0) + 1
    out = []
    for d, s in docs:
        if s not in weights:
            continue
        rate = (weights[s] / wsum) * float(total) / counts[s]
        k = int(rate) + (1 if _u(d) < rate - int(rate) else 0)
        for e in range(1, k + 1):
            out.append((d, s, e, k))
    return sorted(out)


def test_mix_matches_pure_python(spark):
    docs = [(i, f"s{i % 4}") for i in range(120)]  # 30 docs per source
    df = spark.createDataFrame(docs, "doc_id long, source string")
    weights = {"s0": 0.6, "s1": 0.25, "s2": 0.15}  # s3 dropped
    got = sorted(
        (r.doc_id, r.source, r.epoch, r.n_copies)
        for r in mix_corpus(df, weights, total=150).collect()
    )
    want = _py_mix(docs, weights, total=150)
    assert got == want
    # s0 needs 90 docs from 30 -> every doc appears >= 3 times (rate 3.0)
    per_doc = {}
    for d, s, e, k in got:
        per_doc.setdefault((d, s), 0)
        per_doc[(d, s)] += 1
    s0_counts = {d: c for (d, s), c in per_doc.items() if s == "s0"}
    assert len(s0_counts) == 30 and all(c == 3 for c in s0_counts.values())
    # dropped source contributes nothing
    assert not any(s == "s3" for _, s, _, _ in got)
    # composition lands near the target (expected exactly 150 total)
    by_src = {}
    for _, s, _, _ in got:
        by_src[s] = by_src.get(s, 0) + 1
    assert by_src["s0"] == 90
    assert abs(by_src["s1"] - 37.5) <= 6 and abs(by_src["s2"] - 22.5) <= 6


def test_mix_plan_broadcasts_rates(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    plan = (
        mix_corpus(df, {"s0": 0.5, "s1": 0.5}, total=40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
