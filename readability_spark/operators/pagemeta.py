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
