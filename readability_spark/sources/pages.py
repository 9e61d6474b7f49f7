"""Deterministic synthetic Common-Crawl-shaped page table.

Builds the BASELINE.json ``input_hint`` table
``(url, warc_ts, html: binary, text, lang)`` from the driver's ``documents``
parquet, entirely with JVM-side column expressions (``concat``/``repeat`` —
no Python in the loop, fully distributed, scales linearly with input).

The page template is designed so the Readability extraction provably recovers
exact, SQL-expressible fields (this is what the DuckDB oracle recomputes):

- ``<title>`` = "Synthetic Web Archive Document {doc_id} | fakehost" → the
  title splitter keeps the 5-word left side;
- ``<h1>`` duplicates the title → removed by the header-dedup rule;
- header/footer divs carry unlikely-candidate classes → stripped;
- the article div contains REPEAT copies of the document text as <p>s
  (pushes every page beyond charThreshold=500) → extracted text is exactly
  ``rtrim(repeat(text || ' ', REPEAT))``;
- byline/excerpt/site_name/published/lang come from meta tags with
  column-derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPEAT = 12

TITLE_PREFIX = "Synthetic Web Archive Document "
URL_PREFIX = "http://synth.fakehost/doc/"


def synthesize_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (url, warc_ts, html binary, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.concat(F.lit(TITLE_PREFIX), F.col("doc_id").cast("string"))
    byline = F.concat(F.lit("Author "), (F.col("doc_id") % 7).cast("string"))
    excerpt = F.concat(F.lit("Synthetic page for doc "), F.col("doc_id").cast("string"))
    published = F.concat(
        F.lit("2024-01-"), F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0")
    )
    paragraphs = F.repeat(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), REPEAT)
    html = F.concat(
        F.lit("<!DOCTYPE html><html lang=\""),
        F.col("lang"),
        F.lit("\"><head><title>"),
        title,
        F.lit(" | fakehost</title>"),
        F.lit("<meta name=\"author\" content=\""),
        byline,
        F.lit("\"><meta property=\"og:description\" content=\""),
        excerpt,
        F.lit("\"><meta property=\"og:site_name\" content=\""),
        F.col("source"),
        F.lit("\"><meta property=\"article:published_time\" content=\""),
        published,
        F.lit("\"></head><body>"),
        F.lit(
            "<div id=\"header\" class=\"header menu\">"
            "<a href=\"/home\">home</a> <a href=\"/hot\">hot</a></div>"
        ),
        F.lit("<div id=\"doc\" class=\"doc\"><h1>"),
        title,
        F.lit("</h1>"),
        paragraphs,
        F.lit("</div>"),
        F.lit(
            "<div class=\"footer\"><a href=\"/terms\">terms</a> "
            "<a href=\"/privacy\">privacy</a></div>"
        ),
        F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(F.lit(URL_PREFIX), F.col("doc_id").cast("string"), F.lit(".html")).alias(
            "url"
        ),
        (F.to_timestamp(F.lit("2025-04-04 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias(
            "warc_ts"
        ),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# The DuckDB-side equivalents of what extraction recovers from the template
# (used by __spark_entry__.oracle_sql; kept adjacent to the template so they
# evolve together).
ORACLE_URL = f"'{URL_PREFIX}' || doc_id || '.html'"
ORACLE_TITLE = f"'{TITLE_PREFIX}' || doc_id"
ORACLE_BYLINE = "'Author ' || (doc_id % 7)"
ORACLE_EXCERPT = "'Synthetic page for doc ' || doc_id"
ORACLE_PUBLISHED = "'2024-01-' || lpad(((doc_id % 28) + 1)::varchar, 2, '0')"
ORACLE_TEXT = f"rtrim(repeat(text || ' ', {REPEAT}))"

# Byte-exact DuckDB reconstruction of the FULL html template above (the text
# is pure printable ASCII, so varchar length == byte length). Used by the
# WARC round-trip oracle: md5 of this string must equal md5 of the html body
# recovered from the synthesized .warc.gz records.
ORACLE_HTML = (
    "'<!DOCTYPE html><html lang=\"' || lang || '\"><head><title>' || "
    + ORACLE_TITLE
    + " || ' | fakehost</title>'"
    " || '<meta name=\"author\" content=\"' || " + ORACLE_BYLINE + " || '\">'"
    " || '<meta property=\"og:description\" content=\"' || "
    + ORACLE_EXCERPT
    + " || '\">'"
    " || '<meta property=\"og:site_name\" content=\"' || source || '\">'"
    " || '<meta property=\"article:published_time\" content=\"' || "
    + ORACLE_PUBLISHED
    + " || '\">'"
    " || '</head><body>'"
    " || '<div id=\"header\" class=\"header menu\">"
    "<a href=\"/home\">home</a> <a href=\"/hot\">hot</a></div>'"
    " || '<div id=\"doc\" class=\"doc\"><h1>' || " + ORACLE_TITLE + " || '</h1>'"
    f" || repeat('<p>' || text || '</p>', {REPEAT})"
    " || '</div>'"
    " || '<div class=\"footer\"><a href=\"/terms\">terms</a> "
    "<a href=\"/privacy\">privacy</a></div>'"
    " || '</body></html>'"
)
