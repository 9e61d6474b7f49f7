"""RSS 2.0 / Atom feed parsing — discovery-source ingestion, JVM-side.

Feeds are the freshness channel of a crawl (new-URL discovery between
sitemap sweeps); at scale a pipeline parses millions of fetched feed
payloads per cycle. This stays entirely JVM-side via Spark's native
``from_xml`` (Spark 4): no Python UDF, whole feed batches parsed by the
built-in StaxXmlParser with per-row error tolerance (malformed XML →
null struct → zero entries, never a task failure) — the same isolation
contract as the extraction UDF but at codegen cost.

Scale shape: scan → two from_xml projections → posexplode. Zero shuffles;
the entry fan-out is a generator, not a join. Kind detection (RSS vs
Atom) is a prefix test on the payload, so each row pays exactly one
parse of its own dialect plus one trivially-null parse of the other.

Reference parity: crawl-source surface (SURVEY.md §2-extension, same
tier as sources/sitemaps.py — vborovikov/readability never fetches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RSS_SCHEMA = (
    "struct<channel:struct<title:string,"
    "item:array<struct<title:string,link:string,pubDate:string,guid:string>>>>"
)
ATOM_SCHEMA = (
    "struct<title:string,"
    "entry:array<struct<title:string,link:struct<_href:string>,"
    "updated:string,id:string>>>"
)


def parse_feed_entries(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(url, xml) → one row per feed entry:
    (feed_url, kind, feed_title, entry_idx, title, link, published).

    RSS items take (title, link, pubDate); Atom entries take
    (title, link@href, updated). ``published`` is the raw feed string
    (no timestamp coercion — downstream normalizes; feed date dialects
    are too inconsistent to parse at ingest without a reject channel).
    """
    body = F.regexp_replace(F.col(xml_col), r"^\s*<\?xml[^>]*\?>\s*", "")
    kind = F.when(body.startswith("<rss"), F.lit("rss")).otherwise(F.lit("atom"))
    rss = F.from_xml(F.col(xml_col), RSS_SCHEMA)
    atom = F.from_xml(F.col(xml_col), ATOM_SCHEMA)
    parsed = df.select(
        F.col(url_col).alias("feed_url"),
        kind.alias("kind"),
        F.when(kind == "rss", rss["channel"]["title"])
        .otherwise(atom["title"])
        .alias("feed_title"),
        F.when(kind == "rss", F.coalesce(rss["channel"]["item"], F.array()))
        .otherwise(
            F.coalesce(
                F.transform(
                    atom["entry"],
                    lambda e: F.struct(
                        e["title"].alias("title"),
                        e["link"]["_href"].alias("link"),
                        e["updated"].alias("pubDate"),
                        e["id"].alias("guid"),
                    ),
                ),
                F.array(),
            )
        )
        .alias("items"),
    )
    ex = parsed.select(
        "feed_url",
        "kind",
        "feed_title",
        F.posexplode("items").alias("entry_idx", "it"),
    )
    return ex.select(
        "feed_url",
        "kind",
        "feed_title",
        "entry_idx",
        F.col("it")["title"].alias("title"),
        F.col("it")["link"].alias("link"),
        F.col("it")["pubDate"].alias("published"),
    )
