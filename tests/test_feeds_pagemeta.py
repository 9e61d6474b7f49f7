"""Feed parsing (sources/feeds.py) and canonical/robots page meta
(operators/pagemeta.py)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel><title>F</title>'
    "<item><title>E1</title><link>http://a/1</link>"
    "<pubDate>d1</pubDate><guid>g1</guid></item>"
    "<item><title>E2</title><link>http://a/2</link>"
    "<pubDate>d2</pubDate><guid>g2</guid></item></channel></rss>"
)
ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>G</title>'
    '<entry><title>A1</title><link href="http://b/1"/>'
    "<updated>u1</updated><id>i1</id></entry></feed>"
)


def test_parse_feed_entries_both_dialects(spark):
    from readability_spark.sources.feeds import parse_feed_entries

    df = spark.createDataFrame(
        [("u1", RSS), ("u2", ATOM)], "url string, xml string"
    )
    got = sorted(
        (tuple(r) for r in parse_feed_entries(df).collect()),
    )
    assert got == [
        ("u1", "rss", "F", 0, "E1", "http://a/1", "d1"),
        ("u1", "rss", "F", 1, "E2", "http://a/2", "d2"),
        ("u2", "atom", "G", 0, "A1", "http://b/1", "u1"),
    ]


def test_parse_feed_entries_malformed_isolation(spark):
    from readability_spark.sources.feeds import parse_feed_entries

    df = spark.createDataFrame(
        [("ok", RSS), ("trunc", "<rss><channel><title>x"), ("junk", "not xml")],
        "url string, xml string",
    )
    got = parse_feed_entries(df).collect()
    assert {r.feed_url for r in got} == {"ok"}
    assert len(got) == 2


def test_parse_feed_entries_empty_feed(spark):
    from readability_spark.sources.feeds import parse_feed_entries

    empty = '<rss version="2.0"><channel><title>E</title></channel></rss>'
    df = spark.createDataFrame([("u", empty)], "url string, xml string")
    assert parse_feed_entries(df).count() == 0


CASES = [
    # (html, canonical, noindex, nofollow)
    ('<link rel="canonical" href="http://c/1">', "http://c/1", False, False),
    ("<link rel=canonical href=http://c/2>", "http://c/2", False, False),
    ('<link href="http://c/3" rel="canonical">', "http://c/3", False, False),
    ('<LINK REL="CANONICAL" HREF="http://c/4">', "http://c/4", False, False),
    ("", None, False, False),
    ('<meta name="robots" content="noindex, nofollow">', None, True, True),
    ('<meta name="robots" content="NOINDEX">', None, True, False),
    ('<meta name="robots" content="index, follow">', None, False, False),
    ('<meta content="noindex" name="robots">', None, False, False),  # order not matched: documented regex limit
]


def test_page_meta_extraction_table(spark):
    from readability_spark.operators.pagemeta import page_meta

    rows = [
        (str(i), f"<html><head>{frag}<title>t</title></head><body></body></html>")
        for i, (frag, *_ ) in enumerate(CASES)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: r for r in page_meta(df).collect()}
    for i, (_, canon, noindex, nofollow) in enumerate(CASES):
        r = got[str(i)]
        assert r.canonical == canon, f"case {i}"
        assert r.noindex is noindex, f"case {i}"
        assert r.nofollow is nofollow, f"case {i}"
        assert r.canonical_key == (canon or str(i))
        assert r.is_variant is (canon is not None)


def test_canonical_fold_groups(spark):
    from readability_spark.operators.pagemeta import canonical_fold_groups, page_meta

    def pg(url, canon=None, robots=None):
        head = ""
        if canon:
            head += f'<link rel="canonical" href="{canon}">'
        if robots:
            head += f'<meta name="robots" content="{robots}">'
        return (url, f"<html><head>{head}</head><body></body></html>")

    df = spark.createDataFrame(
        [
            pg("http://a/1"),                                  # self group
            pg("http://a/2", canon="http://a/1"),              # variant of 1
            pg("http://a/3", canon="http://a/1", robots="noindex"),
            pg("http://a/4", canon="http://a/4"),              # self-canonical
        ],
        "url string, html string",
    )
    got = {
        r.canonical_key: (r.n_pages, r.n_variants, r.n_indexable)
        for r in canonical_fold_groups(page_meta(df)).collect()
    }
    assert got == {"http://a/1": (3, 2, 2), "http://a/4": (1, 0, 1)}


def test_page_meta_plan_pure_projection(spark):
    from readability_spark.operators.pagemeta import page_meta

    df = spark.createDataFrame([("u", "<html></html>")], "url string, html string")
    plan = page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_jsonld_inventory_parse_and_tolerance(spark):
    from readability_spark.operators.pagemeta import jsonld_inventory

    def pg(block):
        return (f'<html><head><script type="application/ld+json">{block}'
                "</script></head><body></body></html>",)

    df = spark.createDataFrame(
        [
            pg('{"@type": "Article", "headline": "H", "author": {"name": "A"}}'),
            pg('{"@type": "Article"}'),
            pg('{"@context": "x", "@type": "Product", "headline": "P"}'),
            pg('{not json at all'),                      # malformed → dropped
            ("<html><head></head><body>no block</body></html>",),
        ],
        "html string",
    )
    got = {
        r.jsonld_type: (r.n_pages, r.n_with_headline, r.n_with_author)
        for r in jsonld_inventory(df).collect()
    }
    assert got == {"Article": (2, 1, 1), "Product": (1, 1, 0)}


def test_hreflang_pairs_tagwise_no_misalignment(spark):
    from readability_spark.operators.pagemeta import hreflang_pairs

    html = (
        '<html><head>'
        '<link rel="alternate" hreflang="en" href="http://x/en">'
        '<link rel="alternate" hreflang="de">'          # no href → dropped
        '<link rel="stylesheet" href="/s.css">'          # no hreflang → dropped
        '<link hreflang="FR" href="http://x/fr">'
        "</head></html>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html string")
    got = sorted((r.hreflang, r.href) for r in hreflang_pairs(df).collect())
    assert got == [("en", "http://x/en"), ("fr", "http://x/fr")]


def test_pagination_chains_reassembly(spark):
    from readability_spark.operators.pagemeta import pagination_chains

    def pg(url, nxt=None):
        head = f'<link rel="next" href="{nxt}">' if nxt else ""
        return (url, f"<html><head>{head}</head><body></body></html>")

    df = spark.createDataFrame(
        [
            pg("a1", "a2"), pg("a2", "a3"), pg("a3"),      # 3-page article
            pg("b1", "b2"), pg("b2"),                      # 2-page article
            pg("solo"),                                     # no chain
            pg("l1", "l2"), pg("l2", "l1"),                 # loop → excluded
        ],
        "url string, html string",
    )
    got = {
        r.last_page: (r.first_page, r.n_pages)
        for r in pagination_chains(df, max_hops=8).collect()
    }
    assert got == {"a3": ("a1", 3), "b2": ("b1", 2)}


def test_license_classification(spark):
    from readability_spark.operators.pagemeta import license_of

    cases = [
        ('<link rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">', "cc-by-sa"),
        ('<a rel="license" href="http://creativecommons.org/licenses/by/3.0/">x</a>', "cc-by"),
        ('<a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">0</a>', "cc0"),
        ('<link rel="license" href="http://example.com/tos">', "other"),
        ("<p>no license</p>", None),
    ]
    df = spark.createDataFrame(
        [(str(i), f"<html><head>{h}</head></html>") for i, (h, _) in enumerate(cases)],
        "i string, html string",
    )
    got = {
        r.i: r.lic
        for r in df.select("i", license_of(F.col("html")).alias("lic")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[str(i)] == want, f"case {i}"


def test_ai_optout_flags(spark):
    from readability_spark.operators.pagemeta import ai_optout_flags

    cases = [
        ('<meta name="robots" content="noai, noimageai">', (True, True, False)),
        ('<meta name="robots" content="NOAI">', (True, False, False)),
        ('<meta name="robots" content="noindex">', (False, False, False)),
        ('<meta name="tdm-reservation" content="1">', (False, False, True)),
        ("", (False, False, False)),
    ]
    df = spark.createDataFrame(
        [(str(i), f"<html><head>{h}</head></html>") for i, (h, _) in enumerate(cases)],
        "i string, html string",
    )
    got = {
        r.i: (r.f.noai, r.f.noimageai, r.f.tdm_reserved)
        for r in df.select("i", ai_optout_flags(F.col("html")).alias("f")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[str(i)] == want, f"case {i}"


def test_media_tag_inventory_counts(spark):
    from readability_spark.operators.pagemeta import media_tag_inventory

    html = (
        "<html><body>"
        '<img src="a.png"><IMG SRC="b.png">'
        '<img data-src="lazy1.png"><img loading=lazy src="lazy2.png">'
        '<img loading="LAZY" src="lazy3.png">'
        '<video src="v1"></video><video src="v2"></video>'
        '<iframe src="f"></iframe>'
        "<picture><source><img src='p.png'></picture>"
        '<noscript><img src="n.png"></noscript>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = media_tag_inventory(df).collect()[0]
    assert r.n_img == 7            # 2 plain + 3 lazy + picture's + noscript's
    assert r.n_lazy_img == 3
    assert r.n_video == 2
    assert r.n_iframe == 1
    assert r.n_picture == 1
    assert r.n_noscript_img == 1
