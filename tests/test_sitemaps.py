"""Tests for the sitemap source (writer + distributed parser + recrawl
triage) and the change-rate refetch scheduler, each against hand-built
fixtures / pure-Python arithmetic."""

import datetime
import math

from pyspark.sql import functions as F

from readability_spark.operators.snapshots import change_history, refetch_schedule
from readability_spark.sources.sitemaps import (
    parse_sitemaps,
    sitemap_recrawl_candidates,
    synthesize_sitemaps,
)


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


# ---------------------------------------------------------------- parser


HANDMADE = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://ex.com/a?x=1&amp;y=&quot;2&quot; </loc>
    <lastmod>2026-01-15T08:00:00+00:00</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc>http://ex.com/b</loc></url>
  <url><loc>http://ex.com/c</loc><changefreq>sometimes</changefreq>
       <priority>9.9</priority></url>
  <url><loc>http://ex.com/neg</loc><priority>-0.3</priority></url>
  <url><priority>0.8</priority></url>
  <url><loc>http://ex.com/d</loc><lastmod>2026-02-01</lastmod></url>
</urlset>"""

HANDMADE_INDEX = """<sitemapindex>
  <sitemap><loc>http://ex.com/s1.xml</loc><lastmod>2026-03-01</lastmod></sitemap>
  <sitemap><loc>http://ex.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_handmade_urlset(spark):
    sm = spark.createDataFrame([("ex.com", HANDMADE)], "host string, sitemap_xml string")
    got = {r.loc: r for r in parse_sitemaps(sm).collect()}
    assert len(got) == 5  # loc-less entry dropped
    a = got['http://ex.com/a?x=1&y="2"']  # entities undone, loc trimmed
    assert (a.kind, a.changefreq, a.priority) == ("url", "weekly", 0.9)
    assert a.lastmod == datetime.date(2026, 1, 15)  # datetime → date prefix
    b = got["http://ex.com/b"]
    assert (b.lastmod, b.changefreq, b.priority) == (None, None, 0.5)
    c = got["http://ex.com/c"]
    assert (c.changefreq, c.priority) == (None, 1.0)  # invalid token; clamp
    assert got["http://ex.com/neg"].priority == 0.0  # clamp low
    assert got["http://ex.com/d"].lastmod == datetime.date(2026, 2, 1)


def test_parse_handmade_index(spark):
    sm = spark.createDataFrame(
        [("ex.com", HANDMADE_INDEX)], "host string, sitemap_xml string"
    )
    got = sorted(parse_sitemaps(sm).collect(), key=lambda r: r.loc)
    assert [r.kind for r in got] == ["index", "index"]
    assert got[0].loc == "http://ex.com/s1.xml"
    assert got[0].lastmod == datetime.date(2026, 3, 1)
    # index entries never carry changefreq/priority
    assert all(r.changefreq is None and r.priority is None for r in got)


def test_synthesized_roundtrip_branches(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    entries = parse_sitemaps(synthesize_sitemaps(docs)).cache()
    n_hosts = docs.select("source").distinct().count()
    per_host = {r.host: r.cnt for r in entries.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert len(per_host) == n_hosts
    # every host has at least /a and /b; the loc-less entry never survives
    assert min(per_host.values()) >= 2
    assert entries.filter(F.col("loc") == "").count() == 0
    # entity escape in /a is undone
    assert entries.filter(F.col("loc").contains("&amp;")).count() == 0
    assert entries.filter(F.col("loc").contains("&")).count() == n_hosts
    # index rows appear only for the md5 0-3 hosts, two each
    idx = entries.filter(F.col("kind") == "index")
    assert idx.count() % 2 == 0
    assert idx.filter(F.col("changefreq").isNotNull() | F.col("priority").isNotNull()).count() == 0


def test_recrawl_triage(spark):
    entries = spark.createDataFrame(
        [
            ("h", "url", "http://h/new", None, None, 0.5),
            ("h", "url", "http://h/stale", datetime.date(2026, 8, 1), None, 0.5),
            ("h", "url", "http://h/fresh", datetime.date(2026, 7, 1), None, 0.5),
            ("h", "url", "http://h/nohint", None, None, 0.5),
            ("h", "index", "http://h/s.xml", None, None, None),  # ignored
        ],
        "host string, kind string, loc string, lastmod date, changefreq string, priority double",
    )
    crawled = spark.createDataFrame(
        [
            ("http://h/stale", datetime.date(2026, 7, 15)),
            ("http://h/fresh", datetime.date(2026, 7, 15)),
            ("http://h/nohint", datetime.date(2026, 7, 15)),
        ],
        "url string, fetched_on date",
    )
    got = {r.loc: r.action for r in sitemap_recrawl_candidates(entries, crawled).collect()}
    assert got == {
        "http://h/new": "new",
        "http://h/stale": "stale",
        "http://h/fresh": "fresh",
        "http://h/nohint": "fresh",
    }


# ---------------------------------------------------------------- refetch


def test_change_history_counts(spark):
    # doc 1: present all 3 snaps, changes twice; doc 2: never changes;
    # doc 3: added in snap2 (1 check); doc 4: removed after snap0 (0 checks,
    # absent from output)
    s0 = spark.createDataFrame([(1, "a"), (2, "x"), (4, "q")], "doc_id long, text string")
    s1 = spark.createDataFrame([(1, "b"), (2, "x"), (3, "m")], "doc_id long, text string")
    s2 = spark.createDataFrame([(1, "c"), (2, "x"), (3, "m")], "doc_id long, text string")
    got = {r.doc_id: (r.n_checks, r.n_changed) for r in change_history([s0, s1, s2]).collect()}
    assert got == {1: (2, 2), 2: (2, 0), 3: (1, 0)}


def test_refetch_schedule_arithmetic(spark):
    hist = spark.createDataFrame(
        [(1, 2, 2), (2, 2, 0), (3, 4, 1), (4, 1, 1)],
        "doc_id long, n_checks long, n_changed long",
    )
    got = {r.doc_id: (r.lambda_per_day, r.refetch_days) for r in refetch_schedule(hist).collect()}

    def want(n, x):
        lam = -math.log((n - x + 0.5) / (n + 0.5)) / 30.0
        ref = 365.0 if x == 0 else min(max(1.0 / lam, 1.0), 365.0)
        return (_round4(lam), _round4(ref))

    assert got == {1: want(2, 2), 2: want(2, 0), 3: want(4, 1), 4: want(1, 1)}
    # never-changed page: rate 0, interval pinned at the max
    assert got[2] == (0.0, 365.0)


def test_change_history_requires_two_snapshots(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        change_history([df])
