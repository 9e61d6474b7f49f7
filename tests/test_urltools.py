"""URL canonicalization operator tests (crawl-pipeline dedup surface)."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.urltools import (
    canonical_dedup_groups,
    canonical_url,
    domain_stats,
    host_of,
)

pytestmark = pytest.mark.spark

CASES = [
    ("http://a.com/x?utm_source=f&utm_medium=r", "http://a.com/x"),
    ("http://a.com/x?id=3&utm_campaign=z", "http://a.com/x?id=3"),
    ("http://a.com/x?utm_source=f&id=3", "http://a.com/x?id=3"),
    ("http://a.com/x#frag", "http://a.com/x"),
    ("HTTP://A.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default port kept
    ("http://a.com/CaseSensitive/Path", "http://a.com/CaseSensitive/Path"),
    ("http://a.com/x?fbclid=abc", "http://a.com/x"),
    ("not-a-url", "not-a-url"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def test_host_of(spark):
    df = spark.createDataFrame([("HTTPS://Sub.Example.ORG:8080/p?q=1",)], "url string")
    assert df.select(host_of(F.col("url"))).first()[0] == "sub.example.org"


def test_dedup_groups(spark):
    urls = [
        ("http://a.com/x",),
        ("http://a.com/x?utm_source=f",),
        ("HTTP://a.com:80/x#top",),
        ("http://a.com/y",),
    ]
    df = spark.createDataFrame(urls, "url string")
    groups = {r["canonical_url"]: r for r in canonical_dedup_groups(df).collect()}
    assert groups["http://a.com/x"]["n_variants"] == 3
    assert groups["http://a.com/x"]["keep_url"] == "HTTP://a.com:80/x#top"
    assert groups["http://a.com/y"]["n_variants"] == 1


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [("http://a.com/1", 10), ("http://a.com/2", 20), ("http://b.com/1", 5)],
        "url string, n_chars int",
    )
    stats = {r["host"]: r for r in domain_stats(df).collect()}
    assert stats["a.com"]["n_docs"] == 2 and stats["a.com"]["total_chars"] == 30
    assert stats["b.com"]["n_docs"] == 1
