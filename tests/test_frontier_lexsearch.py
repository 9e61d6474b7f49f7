"""Tests for the crawl-frontier prioritizer, BM25 lexical search, and the
inbound anchor-text profile — each checked against an independent pure-Python
reference, plus salting-invariance proofs for the two-phase top-k paths."""

import math

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.frontier import prioritize_frontier, url_depth
from readability_spark.operators.lexsearch import bm25_topk
from readability_spark.operators.links import anchor_profile


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


# ---------------------------------------------------------------- frontier


def test_url_depth(spark):
    df = spark.createDataFrame(
        [
            ("http://h/", 0),
            ("http://h", 0),
            ("http://h/a", 1),
            ("http://h/a/b/x.html", 3),
            ("https://h:8080/a/b?q=1/2", 2),
            ("http://h/a//b/#frag/x", 2),
        ],
        "url string, want int",
    )
    bad = df.filter(url_depth(F.col("url")) != F.col("want")).count()
    assert bad == 0


def _frontier_fixture(spark):
    # 3 hosts; h1 gets a prior of 2.0; u3 already crawled; u1 referenced 3x.
    discovered = spark.createDataFrame(
        [
            ("http://s/1", "http://h1/u1"),
            ("http://s/2", "http://h1/u1"),
            ("http://s/3", "http://h1/u1"),
            ("http://s/1", "http://h1/a/u2"),
            ("http://s/1", "http://h1/u3"),
            ("http://s/1", "http://h2/u4"),
            ("http://s/2", "http://h2/a/b/u5"),
            ("http://s/1", "http://h3/u6"),
        ],
        "url string, href string",
    )
    crawled = spark.createDataFrame([("http://h1/u3",)], "url string")
    scores = spark.createDataFrame([("h1", 2.0)], "host string, host_score double")
    return discovered, crawled, scores


def test_frontier_priority_and_antijoin(spark):
    discovered, crawled, scores = _frontier_fixture(spark)
    got = {
        r.href: (r.host, r.n_refs, r.depth, r.priority, r.rk)
        for r in prioritize_frontier(discovered, crawled, scores).collect()
    }
    assert "http://h1/u3" not in got  # crawled → anti-joined away
    # host_score * n_refs / (1 + depth)
    assert got["http://h1/u1"] == ("h1", 3, 1, _round4(2.0 * 3 / 2), 1)
    assert got["http://h1/a/u2"] == ("h1", 1, 2, _round4(2.0 * 1 / 3), 2)
    assert got["http://h2/u4"] == ("h2", 1, 1, 0.5, 1)
    assert got["http://h2/a/b/u5"] == ("h2", 1, 3, 0.25, 2)
    assert got["http://h3/u6"] == ("h3", 1, 1, 0.5, 1)  # no prior → 1.0


def test_frontier_k_cap_and_salt_invariance(spark):
    # 40 candidate urls on one host, cap at 5 — result must be identical
    # for any salt fan-out (phase-2 re-rank erases the salting).
    discovered = spark.range(40).select(
        F.lit("http://s/x").alias("url"),
        F.concat(F.lit("http://big/p"), F.col("id").cast("string")).alias("href"),
    )
    crawled = spark.createDataFrame([("http://none",)], "url string")
    outs = [
        sorted(
            (r.href, r.rk)
            for r in prioritize_frontier(
                discovered, crawled, k_per_host=5, n_salts=n
            ).collect()
        )
        for n in (1, 4, 16)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 5
    # equal priorities → lexicographic href tiebreak
    assert [h for h, _ in sorted(outs[0], key=lambda t: t[1])] == sorted(
        f"http://big/p{i}" for i in range(40)
    )[:5]


# ---------------------------------------------------------------- bm25


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Independent plain-Python Okapi BM25 (Lucene idf)."""
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, q in queries:
        scores = {}
        for term in set(q.split(" ")):
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    dl = len(t)
                    scores[d] = scores.get(d, 0.0) + idf * (
                        tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                    )
        out[qid] = sorted(
            ((_round4(s), d) for d, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "a quick brown fox"),
    (4, "the fox jumped over the lazy dog"),
    (5, "cat cat cat everywhere"),
    (6, "nothing relevant here at all"),
]
QUERIES = [(0, "cat"), (1, "quick fox"), (2, "the dog")]


def test_bm25_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = bm25_topk(docs, qdf, k=3).collect()
    want = _bm25_reference(DOCS, QUERIES)
    for r in got:
        ws, wd = want[r.query_id][r.rk - 1]
        assert (r.doc_id, r.score) == (wd, ws), (r, want[r.query_id])
    assert len(got) == sum(min(3, len(v)) for v in want.values())


def test_bm25_corpus_stats_shortcut_and_salts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    base = sorted(map(tuple, bm25_topk(docs, qdf, k=3).collect()))
    n, sdl = len(DOCS), sum(len(t.split(" ")) for _, t in DOCS)
    with_stats = sorted(
        map(tuple, bm25_topk(docs, qdf, k=3, corpus_stats=(n, sdl)).collect())
    )
    salted = sorted(map(tuple, bm25_topk(docs, qdf, k=3, n_salts=1).collect()))
    assert base == with_stats == salted


def test_bm25_repeated_query_term_counted_once(spark):
    # query_terms() dedups: "cat cat" must score identically to "cat"
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(0, "cat"), (1, "cat cat")], "query_id long, query string"
    )
    rows = bm25_topk(docs, qdf, k=6).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rk, r.doc_id, r.score))
    assert sorted(by_q[0]) == sorted(by_q[1])


# ---------------------------------------------------------------- anchors


def test_anchor_profile_modal_and_tiebreak(spark):
    links = spark.createDataFrame(
        [
            # t1: "beta" x2 beats "alpha" x1; 2 src hosts
            ("http://a.com/1", "http://t/1", "beta"),
            ("http://a.com/2", "http://t/1", "beta"),
            ("http://b.com/1", "http://t/1", "alpha"),
            # t2: tie 1-1 → lexicographic winner "aa"
            ("http://a.com/1", "http://t/2", "zz"),
            ("http://a.com/3", "http://t/2", "aa"),
        ],
        "url string, href string, anchor string",
    )
    got = {r.href: r for r in anchor_profile(links).collect()}
    t1 = got["http://t/1"]
    assert (t1.n_links, t1.n_src_hosts, t1.n_distinct_anchors) == (3, 2, 2)
    assert (t1.top_anchor, t1.top_anchor_n) == ("beta", 2)
    t2 = got["http://t/2"]
    assert (t2.top_anchor, t2.top_anchor_n) == ("aa", 1)
    assert (t2.n_links, t2.n_src_hosts, t2.n_distinct_anchors) == (2, 1, 2)


# ---------------------------------------------------------------- tf-idf


def _py_tfidf(docs, k=5):
    """docs: list of (doc_id, text). Returns sorted
    (doc_id, term, tf, df, score, rk) rows — sklearn smoothed idf."""
    from collections import Counter

    n = len(docs)
    tfs = {d: Counter(t for t in text.split(" ") if t) for d, text in docs}
    dfq = Counter()
    for c in tfs.values():
        for t in c:
            dfq[t] += 1
    out = []
    for d, c in tfs.items():
        scored = sorted(
            (
                (_round4(tf * (math.log((n + 1.0) / (dfq[t] + 1.0)) + 1.0)), t, tf)
                for t, tf in c.items()
            ),
            key=lambda s: (-s[0], s[1]),
        )
        for rk, (sc, t, tf) in enumerate(scored[:k], 1):
            out.append((d, t, tf, dfq[t], sc, rk))
    return sorted(out)


TFIDF_DOCS = [
    (0, "apple banana apple cherry  apple"),  # double space -> empty token
    (1, "banana cherry banana dates elder"),
    (2, "apple cherry figs figs grape"),
    (3, "zeta yank zeta yank"),  # tf/df ties -> term-asc tiebreak
    (4, "apple banana cherry dates elder figs grape"),
]


def test_tfidf_matches_python_reference(spark):
    from readability_spark.operators.lexsearch import tfidf_topk

    df = spark.createDataFrame(TFIDF_DOCS, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.term, r.tf, r.df, r.score, r.rk)
        for r in tfidf_topk(df, k=3).collect()
    )
    assert got == _py_tfidf(TFIDF_DOCS, k=3)
    by_doc = {}
    for d, t, *_ , rk in got:
        by_doc.setdefault(d, []).append((rk, t))
    # doc 3's tied pair orders by term: yank before zeta
    assert sorted(by_doc[3]) == [(1, "yank"), (2, "zeta")]


def test_tfidf_hot_cold_split_is_invisible(spark):
    from readability_spark.operators.lexsearch import tfidf_topk

    df = spark.createDataFrame(TFIDF_DOCS, "doc_id long, text string")
    rows = lambda out: sorted(map(tuple, out.collect()))
    all_hot = rows(tfidf_topk(df, k=3, hot_df=1))     # whole vocab broadcast
    all_cold = rows(tfidf_topk(df, k=3, hot_df=10**9))  # whole vocab shuffled
    assert all_hot == all_cold == rows(tfidf_topk(df, k=3))


def test_tfidf_plan_shares_postings_shuffle(spark):
    """df derives from the tf aggregate: the corpus must be scanned and
    exploded ONCE, every other consumer riding ReusedExchange; the
    hot-vocabulary side must broadcast. Checked with AQE off — AQE's
    runtime stage reuse keys on the same exchange canonicalization."""
    from readability_spark.operators.lexsearch import tfidf_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            tfidf_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
        )
        assert "ReusedExchange" in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        # one postings scan + one corpus-count scan; never a third
        assert plan.count("Scan parquet") == 2, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
