"""sitemap.xml source: deterministic writer and a distributed parser.

Sitemaps (sitemaps.org protocol, referenced by RFC 9309's `Sitemap:`
directive) are the discovery sidecar next to robots.txt: each host publishes
``<urlset>`` files listing canonical urls with optional ``<lastmod>``,
``<changefreq>`` and ``<priority>`` hints, or a ``<sitemapindex>`` pointing
at child sitemap files. A crawl pipeline parses them to (a) seed the
frontier with urls it never discovered via links and (b) prioritize
re-fetches by the publisher's own freshness hints.

Implemented subset mirrors what large crawlers honor in practice:

- ``<urlset>`` entries: ``loc`` (required; entries without it are dropped),
  ``lastmod`` (W3C date, parsed to a date), ``changefreq`` (kept only when
  it is one of the protocol's seven tokens), ``priority`` (0.0-1.0, clamped;
  protocol default 0.5 when absent or malformed).
- ``<sitemapindex>`` entries: emitted as ``kind='index'`` rows whose ``loc``
  is the child sitemap url — the fetch loop feeds them back in; this module
  does not fetch.
- Entity-decoding of the five XML escapes in ``loc`` (the protocol requires
  urls be entity-escaped).

Everything is JVM column expressions — ``regexp_extract_all`` over the
``<url>``/``<sitemap>`` blocks, then per-field ``regexp_extract`` — so the
whole path has an exact DuckDB oracle and no Python in the loop. A real
XML parser is deliberately NOT used: sitemap files are machine-generated,
the protocol caps them at 50 MB / 50k urls, and the regex subset is the
same one used for WARC/robots parsing (shared with RE2-class engines).

Scale shape: one row in = one host's sitemap blob (bounded 50 MB by the
protocol); the parse is a projection + explode with no shuffle — it stays
embarrassingly parallel at any host count. Downstream joins (e.g.
:func:`sitemap_recrawl_candidates`) key on url and follow the snapshot-diff
shape: hash-partitioned equi-joins, AQE skew handling, never a broadcast of
the url universe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

# entries are scoped to their enclosing block so a <sitemapindex> child's
# <loc> can never leak into the urlset branch (and vice versa)
_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*(\d{4}-\d{2}-\d{2})"
_CHANGEFREQ_RE = r"<changefreq>\s*([a-z]+)\s*</changefreq>"
_PRIORITY_RE = r"<priority>\s*(-?[0-9.]+)\s*</priority>"


def _xml_unescape(col: Column) -> Column:
    """The five XML entity escapes the protocol requires in <loc>."""
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&apos;", "'")
    return F.regexp_replace(out, "&amp;", "&")


def synthesize_sitemaps(docs: DataFrame) -> DataFrame:
    """One deterministic sitemap blob per host (host = source +
    '.example.com'), exercising every parse branch: entity-escaped locs,
    entries with/without lastmod/changefreq/priority, an invalid changefreq
    token, an out-of-range priority, a loc-less entry that must be dropped,
    and — on hosts whose md5 starts 0-3 — a trailing <sitemapindex> blob
    emitted as a SECOND row (a host may publish both).

    Returns (host, sitemap_xml).
    """
    hosts = docs.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host")
    ).distinct()
    hx = F.substring(F.md5(F.col("host")), 1, 1)
    h = F.col("host")
    day = (F.conv(F.substring(F.md5(h), 2, 1), 16, 10).cast("int") % 27 + 1).cast("string")
    lastmod = F.concat(F.lit("2026-07-"), F.lpad(day, 2, "0"))
    entries = F.array_compact(
        F.array(
            # full entry, entity-escaped query in loc
            F.concat(
                F.lit("<url><loc> http://"), h, F.lit("/a?x=1&amp;y=2 </loc>"),
                F.lit("<lastmod>"), lastmod, F.lit("</lastmod>"),
                F.lit("<changefreq>daily</changefreq>"),
                F.lit("<priority>0.8</priority></url>"),
            ),
            # loc only → protocol defaults (null lastmod/changefreq, 0.5)
            F.concat(F.lit("<url><loc>http://"), h, F.lit("/b</loc></url>")),
            # invalid changefreq token + out-of-range priority → null / clamp
            F.when(
                hx.isin(*"01234567"),
                F.concat(
                    F.lit("<url><loc>http://"), h, F.lit("/c</loc>"),
                    F.lit("<changefreq>sometimes</changefreq>"),
                    F.lit("<priority>1.7</priority></url>"),
                ),
            ),
            # lastmod with full W3C datetime → date prefix parsed
            F.when(
                hx.isin(*"0123"),
                F.concat(
                    F.lit("<url><loc>http://"), h, F.lit("/d</loc>"),
                    F.lit("<lastmod>2026-08-02T09:30:00+00:00</lastmod></url>"),
                ),
            ),
            # loc-less entry: dropped by the parser
            F.lit("<url><priority>0.9</priority></url>"),
        )
    )
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
        F.concat_ws("", entries),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>http://"), h,
        F.lit("/sitemap-a.xml</loc><lastmod>2026-08-01</lastmod></sitemap>"),
        F.lit("<sitemap><loc>http://"), h,
        F.lit("/sitemap-b.xml</loc></sitemap></sitemapindex>"),
    )
    base = hosts.select("host", urlset.alias("sitemap_xml"))
    with_index = hosts.filter(hx.isin(*"0123")).select("host", index.alias("sitemap_xml"))
    return base.unionByName(with_index)


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, sitemap_xml) → one row per entry:
    (host, kind, loc, lastmod, changefreq, priority).

    kind is 'url' for <urlset> entries, 'index' for <sitemapindex> children
    (whose changefreq/priority are always null — the protocol defines
    neither for index entries). Entries without a <loc> are dropped.
    """
    blocks = sitemaps.select(
        "host",
        F.explode(
            F.concat(
                F.transform(
                    F.regexp_extract_all("sitemap_xml", F.lit(_URL_BLOCK_RE), F.lit(1)),
                    lambda b: F.struct(F.lit("url").alias("kind"), b.alias("b")),
                ),
                F.transform(
                    F.regexp_extract_all("sitemap_xml", F.lit(_INDEX_BLOCK_RE), F.lit(1)),
                    lambda b: F.struct(F.lit("index").alias("kind"), b.alias("b")),
                ),
            )
        ).alias("e"),
    ).select("host", F.col("e.kind").alias("kind"), F.col("e.b").alias("b"))

    loc = F.regexp_extract("b", _LOC_RE, 1)
    cf = F.regexp_extract("b", _CHANGEFREQ_RE, 1)
    prio_s = F.regexp_extract("b", _PRIORITY_RE, 1)
    prio = F.when(prio_s == "", F.lit(0.5)).otherwise(
        F.least(F.greatest(prio_s.cast("double"), F.lit(0.0)), F.lit(1.0))
    )
    lastmod_s = F.regexp_extract("b", _LASTMOD_RE, 1)
    return (
        blocks.filter(loc != "")
        .select(
            "host",
            "kind",
            _xml_unescape(loc).alias("loc"),
            F.when(lastmod_s == "", F.lit(None).cast("date"))
            .otherwise(F.to_date(lastmod_s))
            .alias("lastmod"),
            F.when(F.col("kind") == "index", F.lit(None).cast("string"))
            .when(cf.isin(*CHANGEFREQS), cf)
            .otherwise(F.lit(None).cast("string"))
            .alias("changefreq"),
            F.when(F.col("kind") == "index", F.lit(None).cast("double"))
            .otherwise(prio)
            .alias("priority"),
        )
    )


def sitemap_recrawl_candidates(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    fetched_col: str = "fetched_on",
) -> DataFrame:
    """Join the parsed urlset entries against the crawl ledger
    (url, fetched_on: date) and classify what to do with each advertised
    url — the decision a recrawl scheduler makes from publisher hints alone:

    - 'new'     — advertised, never crawled (the sitemap-only discovery win);
    - 'stale'   — lastmod is after our last fetch: the publisher says it
      changed — refetch;
    - 'fresh'   — crawled on/after lastmod (or no lastmod hint): trust the
      copy we have.

    Output: (loc, lastmod, priority, fetched_on, action). One url-keyed
    equi-join, both sides hash-partitioned — the snapshot-diff shape; the
    ledger is never broadcast (it is the url universe).
    """
    urls = entries.filter(F.col("kind") == "url").select(
        "loc", "lastmod", "priority"
    ).dropDuplicates(["loc"])
    led = crawled.select(F.col(url_col).alias("loc"), F.col(fetched_col).alias("fetched_on"))
    j = urls.join(led, "loc", "left")
    return j.select(
        "loc",
        "lastmod",
        "priority",
        "fetched_on",
        F.when(F.col("fetched_on").isNull(), F.lit("new"))
        .when(
            F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("fetched_on")),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
        .alias("action"),
    )
