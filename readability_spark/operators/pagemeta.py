"""Indexing directives from page HTML: rel=canonical and meta robots.

Crawl semantics a corpus pipeline must honor before dedup/selection:

- ``<link rel="canonical" href=...>`` — the site's own statement that this
  url is a variant of another; folding on it removes the largest class of
  intentional duplicates (pagination params, session ids, mirrors) before
  any content hashing is paid;
- ``<meta name="robots" content="noindex[, nofollow]">`` — pages the
  publisher excluded from indexing; keeping them in a training corpus is
  both a quality and a compliance problem.

Spark-first: both extractors are codegen ``regexp_extract`` over the html
head — zero Python, zero shuffle (pinned in test_plan_shape.py); the fold
is one map-side-combined groupBy on the canonical key. At 100 TB these
ride the extraction scan: the regex touches only the first KB of head in
practice, and Catalyst prunes every other column. (A DOM-grade parse of
these two tags is deliberately NOT used: the directives live in <head>,
before the tag-soup that needs the tolerant parser, and the regex path
keeps the pre-filter on the JVM where it can gate the expensive
extraction UDF.)

Reference parity: the reference's metadata extractor (Readability.cs
GetArticleMetadata) reads title/byline/og:* but not indexing directives;
this is crawl-pipeline surface (SURVEY.md §2-extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# both attribute orders; html attribute quoting varies
_RX_CANON_REL_FIRST = (
    r'(?i)<link[^>]*\brel\s*=\s*["\']?canonical["\']?[^>]*\bhref\s*=\s*["\']?([^"\'>\s]+)'
)
_RX_CANON_HREF_FIRST = (
    r'(?i)<link[^>]*\bhref\s*=\s*["\']?([^"\'>\s]+)["\']?[^>]*\brel\s*=\s*["\']?canonical'
)
_RX_ROBOTS = (
    r'(?i)<meta[^>]*\bname\s*=\s*["\']?robots["\']?[^>]*\bcontent\s*=\s*["\']([^"\'>]+)'
)


def canonical_of(html: Column) -> Column:
    """First declared canonical href, else null (empty match → null)."""
    a = F.regexp_extract(html, _RX_CANON_REL_FIRST, 1)
    b = F.regexp_extract(html, _RX_CANON_HREF_FIRST, 1)
    pick = F.when(a != "", a).when(b != "", b)
    return pick


def robots_content(html: Column) -> Column:
    """Raw content of the first meta-robots tag, else null."""
    c = F.regexp_extract(html, _RX_ROBOTS, 1)
    return F.when(c != "", c)


def page_meta(df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) → per-page indexing view: canonical target (self when
    undeclared), noindex/nofollow flags, and whether the page is a
    non-canonical variant. Pure projection — compose with a groupBy on
    ``canonical_key`` for fold groups."""
    html = F.col(html_col)
    url = F.col(url_col)
    canon = canonical_of(html)
    robots = F.lower(F.coalesce(robots_content(html), F.lit("")))
    directives = F.transform(F.split(robots, ","), lambda x: F.trim(x))
    return df.select(
        url.alias("url"),
        canon.alias("canonical"),
        F.coalesce(canon, url).alias("canonical_key"),
        (canon.isNotNull() & (canon != url)).alias("is_variant"),
        F.array_contains(directives, "noindex").alias("noindex"),
        F.array_contains(directives, "nofollow").alias("nofollow"),
    )


def canonical_fold_groups(meta: DataFrame) -> DataFrame:
    """page_meta output → per-canonical-key fold accounting: group size,
    variant count, and how many members are index-eligible (not noindex).
    One map-side-combined shuffle on the canonical key."""
    return meta.groupBy(F.col("canonical_key")).agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.col("is_variant").cast("long")).cast("bigint").alias("n_variants"),
        F.sum((~F.col("noindex")).cast("long")).cast("bigint").alias("n_indexable"),
    )


# -- structured data: JSON-LD inventory ------------------------------------

_RX_JSONLD = (
    r'(?is)<script[^>]*\btype\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)</script>'
)

JSONLD_DDL = "t STRING, headline STRING, author STRUCT<name: STRING>"


def jsonld_of(html: Column) -> Column:
    """First JSON-LD block's payload text, else null. The reference reads
    the same block for metadata precedence (Readability.js
    _getJSONLD / core/readability.py JSON-LD extractor); this exposes it
    corpus-wide for schema.org inventory."""
    j = F.regexp_extract(html, _RX_JSONLD, 1)
    return F.when(j != "", j)


def jsonld_inventory(df: DataFrame, html_col: str = "html") -> DataFrame:
    """html → per-@type schema.org inventory: page count, headline and
    author coverage. Parse is Spark-native from_json (JVM Jackson, per-row
    malformed tolerance → null struct); '@type' is aliased to 't' pre-parse
    with one regexp_replace so the schema stays plain DDL. Zero Python;
    one map-side-combined exchange."""
    raw = jsonld_of(F.col(html_col))
    # '"@type":' → '"t":' — cheaper than schema-escaping the @ and immune
    # to from_json's DDL identifier rules
    cooked = F.regexp_replace(raw, r'"@type"\s*:', '"t":')
    parsed = F.from_json(cooked, JSONLD_DDL)
    return (
        df.select(parsed.alias("j"))
        .filter(F.col("j").isNotNull() & F.col("j")["t"].isNotNull())
        .groupBy(F.col("j")["t"].alias("jsonld_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(F.col("j")["headline"].isNotNull().cast("long"))
            .cast("bigint")
            .alias("n_with_headline"),
            F.sum(F.col("j")["author"]["name"].isNotNull().cast("long"))
            .cast("bigint")
            .alias("n_with_author"),
        )
    )


# -- hreflang alternates: the cross-language page cluster source ------------

_RX_LINK_TAGS = r"(?i)<link\b[^>]*>"
_RX_HREFLANG = r'(?i)\bhreflang\s*=\s*["\']?([A-Za-z\-]+)'
_RX_HREF = r'(?i)\bhref\s*=\s*["\']?([^"\'>\s]+)'


def hreflang_pairs(df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) → one row per rel=alternate hreflang declaration:
    (url, hreflang, href). Tag-at-a-time extraction (regexp_extract_all of
    whole <link> tags, then per-tag attribute pulls inside transform) so a
    tag missing either attribute drops out instead of misaligning a
    parallel-arrays zip. Pure codegen; the explode is a generator, not a
    join. hreflang clusters are the standard bitext-mining seed (the
    publisher says these urls are translations of each other)."""
    html = F.col(html_col)
    tags = F.regexp_extract_all(html, F.lit(_RX_LINK_TAGS), 0)
    pairs = F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                F.lower(F.regexp_extract(t, _RX_HREFLANG, 1)).alias("hreflang"),
                F.regexp_extract(t, _RX_HREF, 1).alias("href"),
            ),
        ),
        lambda s: (s["hreflang"] != "") & (s["href"] != ""),
    )
    ex = df.select(F.col(url_col).alias("url"), F.explode(pairs).alias("p"))
    return ex.select(
        "url", F.col("p")["hreflang"].alias("hreflang"), F.col("p")["href"].alias("href")
    )


# -- pagination: rel=next chain sequencing ----------------------------------

_RX_REL_NEXT = (
    r'(?i)<link[^>]*\brel\s*=\s*["\']?next["\']?[^>]*\bhref\s*=\s*["\']?([^"\'>\s]+)'
)


def rel_next_of(html: Column) -> Column:
    """First rel=next href, else null."""
    n = F.regexp_extract(html, _RX_REL_NEXT, 1)
    return F.when(n != "", n)


def pagination_chains(
    df: DataFrame, url_col: str = "url", html_col: str = "html", max_hops: int = 64
) -> DataFrame:
    """(url, html) → one row per multi-page article: (first_page,
    last_page, n_pages). rel=next links form chains; chains are resolved
    with the O(log hops) pointer-doubling resolver
    (urltools.resolve_redirects) and grouped by their terminal page —
    multi-page articles reassemble into one logical document before
    extraction/dedup instead of being N near-dup fragments. Loops
    (misconfigured templates pointing back) are excluded the same way
    redirect loops are."""
    from readability_spark.operators.urltools import resolve_redirects

    edges = (
        df.select(
            F.col(url_col).alias("src"), rel_next_of(F.col(html_col)).alias("dst")
        )
        .filter(F.col("dst").isNotNull())
    )
    resolved = resolve_redirects(edges, max_hops=max_hops).filter(~F.col("looped"))
    return resolved.groupBy(F.col("final").alias("last_page")).agg(
        F.max(F.struct(F.col("hops"), F.col("node")))["node"].alias("first_page"),
        (F.count("*") + 1).cast("bigint").alias("n_pages"),
    ).select("first_page", "last_page", "n_pages")


# -- governance: license declarations and AI-training opt-outs ---------------

_RX_LICENSE_HREF = (
    r'(?i)<(?:link|a)\b[^>]*\brel\s*=\s*["\']?license["\']?[^>]*'
    r'\bhref\s*=\s*["\']?([^"\'>\s]+)'
)
_RX_CC_CODE = r"(?i)creativecommons\.org/licenses/([a-z\-]+)/"
_RX_CC_ZERO = r"(?i)creativecommons\.org/publicdomain/zero"
_RX_TDM = (
    r'(?i)<meta[^>]*\bname\s*=\s*["\']?tdm-reservation["\']?[^>]*'
    r'\bcontent\s*=\s*["\']?1'
)


def license_of(html: Column) -> Column:
    """Declared license class from the first rel=license link: 'cc-<code>'
    for creativecommons.org licenses, 'cc0' for the publicdomain/zero
    mark, 'other' for any other rel=license target, null when
    undeclared."""
    href = F.regexp_extract(html, _RX_LICENSE_HREF, 1)
    cc = F.lower(F.regexp_extract(href, _RX_CC_CODE, 1))
    return (
        F.when(href == "", F.lit(None).cast("string"))
        .when(cc != "", F.concat(F.lit("cc-"), cc))
        .when(href.rlike(_RX_CC_ZERO), F.lit("cc0"))
        .otherwise(F.lit("other"))
    )


def ai_optout_flags(html: Column) -> Column:
    """struct(noai, noimageai, tdm_reserved) from the emerging opt-out
    vocabulary: 'noai'/'noimageai' tokens in the meta-robots directive
    list, and the TDM Reservation Protocol meta (tdm-reservation=1).
    A training pipeline treats any of these as do-not-train."""
    robots = F.lower(F.coalesce(robots_content(html), F.lit("")))
    directives = F.transform(F.split(robots, ","), lambda x: F.trim(x))
    return F.struct(
        F.array_contains(directives, "noai").alias("noai"),
        F.array_contains(directives, "noimageai").alias("noimageai"),
        html.rlike(_RX_TDM).alias("tdm_reserved"),
    )


def governance_report(df: DataFrame, html_col: str = "html") -> DataFrame:
    """html → (license, noai, tdm_reserved, n) compliance routing matrix —
    the do-not-train / attribution-required accounting a pipeline must
    produce before selection. Pure codegen extraction + one
    map-side-combined exchange of three short columns."""
    html = F.col(html_col)
    flags = ai_optout_flags(html)
    return (
        df.select(
            F.coalesce(license_of(html), F.lit("none")).alias("license"),
            flags["noai"].alias("noai"),
            flags["tdm_reserved"].alias("tdm_reserved"),
        )
        .groupBy("license", "noai", "tdm_reserved")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# -- media tag inventory: the DOM-side media census ---------------------------

def media_tag_inventory(df: DataFrame, html_col: str = "html") -> DataFrame:
    """html → per-page media-embed census: <img>/<video>/<iframe>/<picture>
    counts, lazy-loaded images (data-src or loading=lazy — the pattern the
    reference's FixLazyImages pass rewrites, core/readability.py
    _fix_lazy_images), and <noscript><img> fallbacks (the reference's
    noscript-img unwrap input). A multimodal pipeline uses this census to
    route pages into the image-fetch queue and to size that queue BEFORE
    fetching a byte of media. Pure regexp_count codegen — zero Python,
    zero shuffle."""
    h = F.col(html_col)

    def cnt(rx: str):
        return F.regexp_count(h, F.lit(rx)).cast("int")

    return df.select(
        *[c for c in df.columns if c != html_col],
        cnt(r"(?i)<img\b").alias("n_img"),
        cnt(r"(?i)<img\b[^>]*\b(?:data-src|loading\s*=\s*[\"']?lazy)").alias(
            "n_lazy_img"
        ),
        cnt(r"(?i)<video\b").alias("n_video"),
        cnt(r"(?i)<iframe\b").alias("n_iframe"),
        cnt(r"(?i)<picture\b").alias("n_picture"),
        cnt(r"(?i)<noscript>\s*<img\b").alias("n_noscript_img"),
    )
