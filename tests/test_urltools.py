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


def test_blocklist_filter_suffix_and_path(spark):
    from readability_spark.operators.urltools import blocklist_filter

    urls = spark.createDataFrame(
        [
            ("http://ads.example.com/page",),      # subdomain of blocked domain
            ("http://example.com/page",),          # blocked domain exactly
            ("http://sub.deep.example.com/x",),    # deeper subdomain
            ("http://fine.org/casino/slots",),     # path keyword
            ("http://fine.org/news/today",),       # clean
            ("http://notexample.com/x",),          # suffix must match on label
        ],
        "url string",
    )
    blocked = spark.createDataFrame([("example.com",)], "domain string")
    out = {r.url: r for r in
           blocklist_filter(urls, blocked, r"/(casino|poker|warez)/").collect()}
    assert out["http://ads.example.com/page"].reason == "blocked_host"
    assert out["http://example.com/page"].reason == "blocked_host"
    assert out["http://sub.deep.example.com/x"].reason == "blocked_host"
    assert out["http://fine.org/casino/slots"].reason == "blocked_path"
    assert out["http://fine.org/news/today"].reason is None
    assert out["http://fine.org/news/today"].keep
    # 'notexample.com' does NOT end with '.example.com' -> not blocked
    assert out["http://notexample.com/x"].reason is None
    assert sum(1 for r in out.values() if not r.keep) == 4


def test_blocklist_host_beats_path(spark):
    from readability_spark.operators.urltools import blocklist_filter

    urls = spark.createDataFrame([("http://bad.com/casino/x",)], "url string")
    blocked = spark.createDataFrame([("bad.com",)], "domain string")
    r = blocklist_filter(urls, blocked, r"/casino/").collect()[0]
    assert r.reason == "blocked_host" and not r.keep


def test_length_quantiles_exact_and_approx_schema(spark):
    from readability_spark.operators.textstats import length_quantiles

    df = spark.createDataFrame(
        [("en", i) for i in range(1, 101)] + [("es", 10), ("es", 20)],
        "lang string, n_chars int",
    )
    rows = {r.lang: r for r in length_quantiles(df).collect()}
    # linear interpolation over 1..100: p25 at rank (99*.25)=24.75 -> 25.75
    assert rows["en"].n_docs == 100
    assert rows["en"].p25 == 25.75
    assert rows["en"].p50 == 50.5
    assert rows["en"].p99 == 99.01
    assert rows["es"].p50 == 15.0
    approx = length_quantiles(df, exact=False)
    assert approx.columns == ["lang", "n_docs", "p25", "p50", "p75", "p95", "p99"]
    arows = {r.lang: r for r in approx.collect()}
    assert abs(arows["en"].p50 - 50.5) <= 1.0


def test_url_features_known_values(spark):
    from readability_spark.operators.urltools import url_features

    df = spark.createDataFrame(
        [
            (1, "http://promo-3-cheap4u.win7.ads.example.biz/a/b/c/d/e/p1.html?q=1&s=2&t=3"),
            (2, "https://news.example.org/articles/9"),
            (3, "http://www.example.net/p%20q%3A/7"),
        ],
        "doc_id long, url string",
    )
    rows = {r.url: r for r in url_features(df).collect()}
    spam = rows["http://promo-3-cheap4u.win7.ads.example.biz/a/b/c/d/e/p1.html?q=1&s=2&t=3"]
    assert spam.host == "promo-3-cheap4u.win7.ads.example.biz"
    assert spam.n_subdomains == 4
    assert spam.host_hyphens == 2
    assert spam.path_depth == 6
    assert spam.n_params == 3
    clean = rows["https://news.example.org/articles/9"]
    assert clean.n_params == 0
    assert clean.path_depth == 2
    assert clean.pct_encoded == 0
    enc = rows["http://www.example.net/p%20q%3A/7"]
    assert enc.pct_encoded == 2
    # the ad-spam shape must clearly outrank the clean article url
    assert spam.suspicion > clean.suspicion + 0.3


def test_url_date_of_conventions(spark):
    from pyspark.sql import functions as F

    from readability_spark.operators.urltools import url_date_of

    cases = [
        ("http://a.com/2024/01/post", (2024, 1)),
        ("http://a.com/blog/1999/12/x", (1999, 12)),
        ("http://a.com/20240115/x", (2024, 1)),
        ("http://a.com/20241301/x", None),     # month 13 → not a date
        ("http://a.com/2024/13/x", None),
        ("http://a.com/about", None),
        ("http://a.com/30240101/x", None),     # year 3024 out of range
    ]
    df = spark.createDataFrame(
        [(str(i), u) for i, (u, _) in enumerate(cases)], "i string, url string"
    )
    got = {
        r.i: (None if r.d is None else (r.d.year, r.d.month))
        for r in df.select("i", url_date_of(F.col("url")).alias("d")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[str(i)] == want, f"case {i}"
