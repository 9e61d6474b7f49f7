"""URL canonicalization + domain analytics for crawl pipelines.

A crawl feed reaches the same page through tracking-parameter variants,
fragments, and default ports; deduplicating on the RAW url string misses
all of them. These operators are pure JVM column expressions (regexes kept
in the syntax subset Java regex and DuckDB RE2 share, so every step has an
exact SQL oracle) — no Python in the loop, linear scale.

Reference scope note: the reference library operates on single documents
and has no pipeline-level url dedup; this is part of the training-data
pipeline surface (brief: dedup family). Its per-document url resolution
(DocumentUrl.cs) lives in core/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = "(utm_[a-z]+|fbclid|gclid|mc_cid|mc_eid|ref_src)"


def canonical_url(col) -> Column:
    """Normalize a url for identity comparison:

    1. strip the fragment;
    2. strip tracking query params (utm_*, fbclid, gclid, ...);
    3. collapse query separators left behind (``?&`` / ``&&`` / trailing);
    4. strip default ports (:80 for http, :443 for https);
    5. lowercase scheme and host (path/query stay case-sensitive).
    """
    u = F.regexp_replace(col, r"#.*$", "")
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAMS + r"=[^&]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # lowercase scheme+host BEFORE port stripping so HTTP://H:80 normalizes
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/?#]*", "")
    u = F.when(scheme_host != "", F.concat(scheme_host, rest)).otherwise(u)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(/|\?|$)", r"$1$2")
    return u


def host_of(col) -> Column:
    """Registrable host portion (no userinfo/port handling beyond split)."""
    return F.lower(F.regexp_extract(col, r"^[a-zA-Z]+://([^/:?#]+)", 1))


def canonical_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Groups of urls identical after canonicalization:
    (canonical_url, n_variants, keep_url). One shuffle, map-side combine."""
    return (
        pages.select(canonical_url(F.col(url_col)).alias("canonical_url"), url_col)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min(url_col).alias("keep_url"),
        )
    )


def domain_stats(pages: DataFrame, url_col: str = "url", chars_col: str = "n_chars") -> DataFrame:
    """Per-host corpus stats — the lineage/metrics rollup a crawl pipeline
    reports per domain (doc counts, total/mean content size)."""
    return (
        pages.select(host_of(F.col(url_col)).alias("host"), chars_col)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
        )
    )
