"""Brute-force oracles for the temporal joins (as-of, interval), collocation
mining, phrase search, and the no-global-sort shuffle index."""

import datetime as dt
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from readability_spark.operators.collocations import phrase_search, pmi_bigrams
from readability_spark.operators.ordering import global_shuffle_index
from readability_spark.operators.temporal import asof_join, interval_join


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def tiny_events(spark):
    random.seed(7)
    left, right = [], []
    for i in range(400):
        left.append((i, random.randrange(8), _t(random.randrange(50), random.randrange(60))))
    for j in range(300):
        right.append(
            (1000 + j, random.randrange(8), _t(random.randrange(50), random.randrange(60)),
             float(j))
        )
    l_df = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    r_df = spark.createDataFrame(right, "event_id long, user_id long, ts timestamp, value double")
    return left, right, l_df, r_df


def _brute_asof(left, right, tolerance=None):
    out = {}
    for eid, u, ts in left:
        cands = [r for r in right if r[1] == u and r[2] <= ts]
        if tolerance is not None:
            cands = [r for r in cands if (ts - r[2]).total_seconds() <= tolerance]
        if cands:
            best = max(cands, key=lambda r: (r[2], r[0]))
            out[eid] = (best[0], best[3])
        else:
            out[eid] = (None, None)
    return out


def test_asof_join_matches_brute_force(tiny_events):
    left, right, l_df, r_df = tiny_events
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(
            l_df, r_df, key="user_id", ts="ts",
            right_value_cols=["event_id", "value"], right_id="event_id",
        ).collect()
    }
    assert got == _brute_asof(left, right)
    assert len(got) == len(left)  # every left row survives (left join)


def test_asof_join_tolerance(tiny_events):
    left, right, l_df, r_df = tiny_events
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(
            l_df, r_df, key="user_id", ts="ts",
            right_value_cols=["event_id", "value"], right_id="event_id",
            tolerance_seconds=120,
        ).collect()
    }
    assert got == _brute_asof(left, right, tolerance=120)


def test_asof_join_equal_ts_ties(spark):
    # a right row AT the left ts matches; among equal-ts rights the largest
    # right_id wins, deterministically
    l_df = spark.createDataFrame([(1, 5, _t(10))], "event_id long, user_id long, ts timestamp")
    r_df = spark.createDataFrame(
        [(100, 5, _t(10), 1.0), (101, 5, _t(10), 2.0), (99, 5, _t(9), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        l_df, r_df, key="user_id", ts="ts",
        right_value_cols=["event_id", "value"], right_id="event_id",
    ).collect()[0]
    assert row["asof_event_id"] == 101 and row["asof_value"] == 2.0


def test_asof_join_single_shuffle(tiny_events):
    _, _, l_df, r_df = tiny_events
    plan = asof_join(
        l_df, r_df, key="user_id", ts="ts", right_value_cols=["value"], right_id="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # the union-window shuffle
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("bucket_seconds", [60, 300, 3600])
def test_interval_join_matches_brute_force(tiny_events, bucket_seconds):
    left, right, l_df, r_df = tiny_events
    # build intervals [ts, ts + 7 min) from the right rows — spans multiple
    # cells at bucket=60, fractions of one at bucket=3600
    iv = r_df.select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 7 MINUTES")).alias("end"),
    )
    got = {
        (r["iv_id"], r["event_id"])
        for r in interval_join(
            l_df, iv, key="user_id", ts="ts", bucket_seconds=bucket_seconds
        ).collect()
    }
    want = {
        (rid, eid)
        for rid, ru, rts, _ in right
        for eid, lu, lts in left
        if lu == ru and rts <= lts < rts + dt.timedelta(minutes=7)
    }
    assert got == want


def test_pmi_bigrams_tiny(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b")], "doc_id long, text string"
    )
    rows = {(r["a"], r["b"]): (r["n_ab"], r["pmi"]) for r in
            pmi_bigrams(docs, min_count=1).collect()}
    # tokens: a×3 b×3 c×1 (M=7); bigrams: ab×3, ba×1, bc×1 (N=5)
    import math
    n_ab, pmi = rows[("a", "b")]
    assert n_ab == 3
    assert pmi == pytest.approx(math.log((3 / 5) / ((3 / 7) * (3 / 7))))
    assert rows[("b", "c")][0] == 1


def test_phrase_search_tiny(spark):
    docs = spark.createDataFrame(
        [(0, "x table part y table part"), (1, "table x part"), (2, "part table")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in
           phrase_search(docs, ["table", "part"]).collect()}
    assert got == {0: 2}
    # three-term phrase chains the positional join
    got3 = {r["doc_id"]: r["n_hits"] for r in
            phrase_search(docs, ["table", "part", "y"]).collect()}
    assert got3 == {0: 1}


def test_global_shuffle_index_matches_global_window(spark):
    docs = spark.range(0, 5000, 1, 16).select(F.col("id").alias("doc_id"))
    got = global_shuffle_index(docs, seed="s:").orderBy("doc_id").collect()
    want = (
        docs.select(
            "doc_id",
            (F.row_number().over(
                Window.orderBy(F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string"))))
            ) - 1).alias("shuffle_idx"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["shuffle_idx"] for r in got] == [r["shuffle_idx"] for r in want]
    idxs = sorted(r["shuffle_idx"] for r in got)
    assert idxs == list(range(5000))  # a total permutation


def test_global_shuffle_index_no_single_task_sort(spark):
    docs = spark.range(0, 5000, 1, 16).select(F.col("id").alias("doc_id"))
    plan = global_shuffle_index(docs, seed="s:")._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange allowed is the 256-row offsets table;
    # the row-bearing side must partition by _bucket
    assert "Exchange hashpartitioning(_bucket" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_interval_join_is_equi_join(tiny_events):
    _, _, l_df, r_df = tiny_events
    iv = r_df.select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 7 MINUTES")).alias("end"),
    )
    plan = interval_join(
        l_df, iv, key="user_id", ts="ts", bucket_seconds=300
    )._jdf.queryExecution().executedPlan().toString()
    # bucketization must turn the range predicate into a hash-joinable key:
    # no nested-loop / cartesian fallback anywhere in the plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pmi_small_sides_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(100)], "doc_id long, text string"
    )
    plan = pmi_bigrams(docs, min_count=1)._jdf.queryExecution().executedPlan().toString()
    # unigram counts (x2) and the totals scalar ride broadcast exchanges;
    # the only hash shuffles are the two groupBys
    assert plan.count("BroadcastExchange") >= 3
    assert "SortMergeJoin" not in plan


def test_funnel_strict_order_semantics(spark):
    from readability_spark.operators.temporal import funnel_counts

    # u1 completes view->click->purchase in order; u2 purchases BEFORE
    # clicking (purchase must not count); u3 only views; u4 clicks with no
    # prior view (never enters the funnel).
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        (2, "2024-01-01 09:00:00", "view"),
        (2, "2024-01-01 09:10:00", "purchase"),
        (2, "2024-01-01 09:20:00", "click"),
        (3, "2024-01-01 08:00:00", "view"),
        (4, "2024-01-01 07:00:00", "click"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts string, event_type string")
    got = {
        r["stage"]: (r["n_users"], r["conversion"])
        for r in funnel_counts(events, ("view", "click", "purchase")).collect()
    }
    assert got["view"] == (3, None)
    assert got["click"][0] == 2 and abs(got["click"][1] - 0.6667) < 1e-9
    assert got["purchase"][0] == 1 and abs(got["purchase"][1] - 0.5) < 1e-9


def test_funnel_equal_timestamp_not_counted(spark):
    from readability_spark.operators.temporal import funnel_counts

    # click at EXACTLY the view's timestamp is not strictly after it
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "view"), (1, "2024-01-01 10:00:00", "click")],
        "user_id long, ts string, event_type string",
    )
    got = {r["stage"]: r["n_users"] for r in funnel_counts(events, ("view", "click")).collect()}
    assert got == {"view": 1, "click": 0}


def test_detect_bursts_flags_known_spike(spark):
    """9 calm hourly buckets of 10±1 events then one 60-event bucket: only
    the spike is flagged, with z computed from the trailing-6 moments."""
    import datetime as dt
    import math

    from readability_spark.operators.temporal import detect_bursts

    base = dt.datetime(2024, 1, 1)
    rows = []
    counts = [10, 11, 9, 10, 11, 9, 10, 11, 9, 60]
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append(("fetch", base + dt.timedelta(hours=h, seconds=j)))
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {
        r["bucket_start"].hour: r
        for r in detect_bursts(ev, trail=6, z_thresh=2.5).collect()
    }
    assert [h for h, r in sorted(out.items()) if r["is_burst"]] == [9]
    # trailing window for hour 9 = hours 3..8 -> mean 10, sample var 1
    tail = counts[3:9]
    mean = sum(tail) / 6
    var = (sum(c * c for c in tail) - sum(tail) ** 2 / 6) / 5
    z = (60 - mean) / math.sqrt(var)
    assert abs(out[9]["z"] - z) < 1e-3
    assert out[0]["z"] is None and not out[0]["is_burst"]  # no trailing data
    assert out[9]["trail_n"] == 6 and out[1]["trail_n"] == 1


def test_detect_bursts_zero_variance_trailing_window(spark):
    """A constant trailing window (variance 0) must yield NULL z and no
    burst flag, not a division blow-up."""
    import datetime as dt

    from readability_spark.operators.temporal import detect_bursts

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(5):
        for j in range(7):  # identical count every bucket
            rows.append(("err", base + dt.timedelta(hours=h, seconds=j)))
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    for r in detect_bursts(ev, trail=6).collect():
        assert r["z"] is None and not r["is_burst"]
