"""Prefix-doubling suffix array + range-partitioned global dense rank."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from readability_spark.operators.ordering import dense_rank_global
from readability_spark.operators.suffix import suffix_ranks


def _brute_suffix_ranks(docs):
    sfx = []
    for d, text in docs:
        toks = text.split(" ")
        for p in range(len(toks)):
            sfx.append((tuple(toks[p:]), d, p))
    ranks = {}
    for key in sorted({s[0] for s in sfx}):
        ranks[key] = len(ranks) + 1
    return {(d, p): ranks[key] for key, d, p in sfx}


@pytest.fixture(scope="module")
def random_docs(spark):
    random.seed(11)
    vocab = ["a", "b", "ab", "ba", "aa", "c"]  # prefix-heavy on purpose
    docs = [
        (i, " ".join(random.choice(vocab) for _ in range(random.randrange(1, 40))))
        for i in range(60)
    ]
    return docs, spark.createDataFrame(docs, "doc_id long, text string")


def test_suffix_ranks_match_brute_force(random_docs):
    docs, df = random_docs
    got = {(r["doc_id"], r["p"]): r["rank"] for r in suffix_ranks(df).collect()}
    assert got == _brute_suffix_ranks(docs)


def test_suffix_ranks_partition_independent(random_docs):
    docs, df = random_docs
    a = {(r["doc_id"], r["p"]): r["rank"]
         for r in suffix_ranks(df.repartition(2), n_parts=3).collect()}
    b = {(r["doc_id"], r["p"]): r["rank"]
         for r in suffix_ranks(df.repartition(13), n_parts=17).collect()}
    assert a == b


def test_suffix_ranks_shared_prefix_ordering(spark):
    # "agg" suffix must rank BEFORE "agg row" (shorter-prefix-first), and
    # identical suffixes in different docs share a dense rank
    df = spark.createDataFrame(
        [(0, "agg row"), (1, "agg"), (2, "agg row")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["p"]): r["rank"] for r in suffix_ranks(df).collect()}
    # suffixes: (0,0)=agg row  (0,1)=row  (1,0)=agg  (2,0)=agg row  (2,1)=row
    assert got[(1, 0)] == 1          # "agg"
    assert got[(0, 0)] == 2          # "agg row"
    assert got[(0, 0)] == got[(2, 0)]
    assert got[(0, 1)] == got[(2, 1)] == 3  # "row"


def test_dense_rank_global_matches_naive_window(spark):
    df = spark.range(0, 3000, 1, 16).select(
        (F.col("id") % 97).alias("k1"), ((F.col("id") * 31) % 13).alias("k2")
    )
    got = dense_rank_global(df, ["k1", "k2"], out="r", n_parts=8)
    want = df.withColumn(
        "r", F.dense_rank().over(Window.orderBy("k1", "k2"))
    )
    assert sorted((r["k1"], r["k2"], r["r"]) for r in got.collect()) == sorted(
        (r["k1"], r["k2"], r["r"]) for r in want.collect()
    )


def test_dense_rank_global_no_big_single_partition_exchange(spark):
    df = spark.range(0, 3000, 1, 16).select((F.col("id") % 97).alias("k"))
    plan = dense_rank_global(df, ["k"], out="r")._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange is the n_parts-row counts table
    # (the range exchange itself lives behind the checkpoint's ExistingRDD
    # scan — materialized once so both branches see identical partitions)
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Scan ExistingRDD" in plan


def _brute_spans(docs, length, min_count=2):
    from collections import Counter
    wins = []
    for d, text in docs:
        toks = text.split(" ")
        for p in range(len(toks) - length + 1):
            wins.append((d, p, tuple(toks[p:p + length])))
    counts = Counter(w for _, _, w in wins)
    marked = sorted((d, p) for d, p, w in wins if counts[w] >= min_count)
    spans = []
    by_doc = {}
    for d, p in marked:
        by_doc.setdefault(d, []).append(p)
    for d, ps in by_doc.items():
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p == prev + 1:
                prev = p
                n += 1
            else:
                spans.append((d, start, prev + length - 1, n))
                start = prev = p
                n = 1
        spans.append((d, start, prev + length - 1, n))
    return sorted(spans)


@pytest.fixture(scope="module")
def dup_docs(spark):
    random.seed(23)
    vocab = ["a", "b", "c", "d"]
    base = [" ".join(random.choice(vocab) for _ in range(random.randrange(8, 30)))
            for _ in range(25)]
    # inject verbatim repeats: doc i+25 shares doc i's middle
    docs = [(i, t) for i, t in enumerate(base)]
    docs += [(i + 25, base[i] + " d c b a " + base[(i + 3) % 25]) for i in range(10)]
    return docs, spark.createDataFrame(docs, "doc_id long, text string")


@pytest.mark.parametrize("length", [3, 4, 6])
def test_exact_duplicate_spans_match_brute_force(dup_docs, length):
    from readability_spark.operators.suffix import exact_duplicate_spans

    docs, df = dup_docs
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in exact_duplicate_spans(df, length=length, n_parts=7).collect()
    )
    assert got == _brute_spans(docs, length)


def test_exact_spans_agree_with_windowed_hash_variant(dup_docs):
    from readability_spark.operators.spans import duplicate_ngram_spans
    from readability_spark.operators.suffix import exact_duplicate_spans

    _, df = dup_docs
    exact = sorted(map(tuple, exact_duplicate_spans(df, length=8).collect()))
    hashed = sorted(map(tuple, duplicate_ngram_spans(df, k=8).collect()))
    assert exact == hashed  # no 60-bit collisions at this size
