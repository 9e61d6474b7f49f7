"""HyperLogLog sketch: Spark registers/estimate vs an independent pure
Python recomputation, estimate sanity vs exact counts, and the
map-side-combine shuffle shape."""

import hashlib
import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    HLL_M,
    HLL_NUM,
    HLL_SMALL,
    cms_estimate,
    cms_table,
    hll_distinct,
    hll_registers,
)

pytestmark = pytest.mark.spark


def _py_hll(pairs):
    regs = defaultdict(dict)
    for grp, item in pairs:
        hx = hashlib.md5(item.encode()).hexdigest()[:16]
        b, v = int(hx[:3], 16), int(hx[3:16], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        regs[grp][b] = max(regs[grp].get(b, 0), rho)
    out = {}
    for grp, M in regs.items():
        n_reg = len(M)
        total = sum(1 << (53 - m) for m in M.values()) + (HLL_M - n_reg) * (1 << 53)
        raw = HLL_NUM / float(total)
        small = raw <= HLL_SMALL and n_reg < HLL_M
        est = HLL_M * math.log(HLL_M / float(HLL_M - n_reg)) if small else raw
        out[grp] = (
            n_reg, max(M.values()), sum(M.values()), round(raw, 4), round(est, 4),
        )
    return out


@pytest.fixture(scope="module")
def pairs():
    # duplicated items across groups: the max-merge must collapse them
    return [(f"g{i % 3}", f"tok{(i * 11 + j) % 400}") for i in range(60) for j in range(40)]


def test_hll_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "grp_in string, item string")
    got = {
        r.grp: (r.n_registers, r.max_register, r.sum_registers, r.raw_est, r.hll_est)
        for r in hll_distinct(df, "grp_in", "item").collect()
    }
    assert got == _py_hll(pairs)


def test_hll_estimate_near_exact(spark, pairs):
    df = spark.createDataFrame(pairs, "grp_in string, item string")
    est = {r.grp: r.hll_est for r in hll_distinct(df, "grp_in", "item").collect()}
    exact = defaultdict(set)
    for g, i in pairs:
        exact[g].add(i)
    for g, items in exact.items():
        # p=12 standard error ~1.04/sqrt(4096) = 1.6%; allow 10%
        assert abs(est[g] - len(items)) / len(items) < 0.10, (g, est[g], len(items))


def test_hll_register_state_bounded(spark, pairs):
    df = spark.createDataFrame(pairs, "grp_in string, item string")
    regs = hll_registers(df, "grp_in", "item")
    assert regs.count() <= 3 * HLL_M
    assert regs.agg(F.max("register")).first()[0] <= 53


def _py_cms_cell(j, item):
    return (j, int(hashlib.md5(f"{j}:{item}".encode()).hexdigest()[:3], 16))


def test_cms_matches_python_reference(spark, pairs):
    items = [p[1] for p in pairs]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    table = cms_table(df, "item")
    cells = defaultdict(int)
    for it in items:
        for j in range(CMS_D):
            cells[_py_cms_cell(j, it)] += 1
    got = {(r.j, r.bucket): r.n for r in table.collect()}
    assert got == dict(cells)
    # point estimates: upward-biased, exact when no collision
    qs = spark.createDataFrame([(i,) for i in sorted(set(items))], "item string")
    est = {r.q_item: r.cms_est for r in cms_estimate(table, qs, "item").collect()}
    truth = defaultdict(int)
    for it in items:
        truth[it] += 1
    for it, n in truth.items():
        assert est[it] == min(cells[_py_cms_cell(j, it)] for j in range(CMS_D))
        assert est[it] >= n


def test_cms_table_bounded(spark):
    df = spark.range(0, 20000).select(F.concat(F.lit("t"), (F.col("id") % 5000)).alias("item"))
    assert cms_table(df, "item").count() <= CMS_D * CMS_W


def test_hll_shuffle_has_partial_agg(spark, pairs):
    """The (grp,bucket) shuffle must carry partial max registers, not raw
    items — the property that bounds shuffle width at any item count."""
    df = spark.createDataFrame(pairs, "grp_in string, item string")
    plan = (
        hll_distinct(df, "grp_in", "item")
        ._jdf.queryExecution().executedPlan().toString()
    )
    before_exchange = plan.split("Exchange")[-1]  # deepest = upstream side
    assert "partial_max" in before_exchange or "partial_max" in plan, plan


def test_quantile_bins_bounded_width_and_state(spark):
    from readability_spark.operators.sketches import quantile_bins

    df = spark.range(1, 200000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    rows = quantile_bins(df, "grp", "v").collect()
    # every value of 1..199999 lands in a bin; register count stays tiny
    assert sum(r["n"] for r in rows) == 199999
    assert len(rows) < 80
    for r in rows:
        assert r["bin_lo"] <= r["bin_hi"]
        # <= 25% relative width by construction
        assert (r["bin_hi"] - r["bin_lo"]) <= max(r["bin_lo"] * 0.25, 0)


def test_quantile_histogram_error_bound(spark):
    from readability_spark.operators.sketches import quantile_histogram_estimates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = quantile_histogram_estimates(docs, "lang", "n_chars").collect()
    assert rows
    for r in rows:
        for p in (50, 90, 99):
            est, exact = r[f"p{p}_est"], r[f"p{p}_exact"]
            assert est is not None and exact is not None
            # estimate read off <=25%-wide bins stays within ~30% of exact
            assert abs(est - exact) <= 0.30 * exact + 1.0, (r["grp"], p, est, exact)


def test_hll_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from readability_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    toks = spark.createDataFrame(
        [(f"s{i % 3}", f"tok{i % 500}") for i in range(4000)], "shard string, tok string"
    )
    regs = hll_registers(toks, "shard", "tok")
    merged = hll_estimate(hll_merge(regs)).collect()[0]
    direct = hll_estimate(
        hll_registers(toks.withColumn("g", F.lit("direct")), "g", "tok")
    ).collect()[0]
    # mergeability: per-shard max-merge must equal the one-pass sketch
    assert merged.n_registers == direct.n_registers
    assert merged.sum_registers == direct.sum_registers
    assert merged.hll_est == direct.hll_est
