"""MIME sniffing over raw fetched payloads — magic bytes vs declared type.

Crawl reality: the Content-Type header lies constantly (HTML served as
text/plain, PDFs as octet-stream, gzip double-compression), and a training
pipeline routes payloads by what they ARE, not what the server said. This
is the WHATWG mime-sniffing idea (https://mimesniff.spec.whatwg.org §6-7:
match the leading byte pattern table before trusting metadata), reduced to
the signature set a text-corpus pipeline routes on.

Spark-first: the sniff is a single ``CASE`` chain over the payload's first
bytes — ``hex(substring(binary))`` prefix compares, all JVM codegen, zero
Python, zero shuffle. At 100 TB this is a free rider on the ingest scan
(narrow, pushdown-friendly: only the payload's first 16 bytes are ever
inspected, and with parquet the column scan is the only cost).

Reference parity: vborovikov/readability consumes only HTML strings; the
payload-routing front end is LLM-pipeline surface (SURVEY.md
§2-extension), same tier as sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (mime, hex-prefix) in precedence order: longer/stronger signatures first.
# Hex compare keeps the whole chain inside whole-stage codegen.
_MAGIC = [
    ("image/png", "89504E470D0A1A0A"),
    ("application/pdf", "25504446"),  # %PDF
    ("image/gif", "474946383761"),  # GIF87a
    ("image/gif", "474946383961"),  # GIF89a
    ("image/jpeg", "FFD8FF"),
    ("application/gzip", "1F8B"),
    ("application/zip", "504B0304"),
    ("application/warc", "574152432F"),  # "WARC/"
    ("audio/wav", "52494646"),  # RIFF
]

# HTML tag-opening prefixes after whitespace skip (spec §7.1 table, the
# subset with unambiguous ASCII spellings; case-insensitive).
_HTML_PREFIXES = ["<!DOCTYPE", "<HTML", "<HEAD", "<BODY", "<SCRIPT", "<!--", "<?XML"]


def sniff_mime(payload: Column) -> Column:
    """binary → sniffed mime string. Pure column expression (codegen)."""

    def has_magic(hx: str) -> Column:
        return F.hex(F.substring(payload, 1, len(hx) // 2)) == hx

    # text path: strip leading ASCII whitespace, then tag-prefix match
    # ISO-8859-1 decode is total (every byte maps) — UTF-8 decode throws on
    # the binary magics under ANSI mode, and the prefix table is pure ASCII
    # so the byte-transparent charset sniffs identically
    head = F.decode(F.substring(payload, 1, 64), "ISO-8859-1")
    # spec's leading-whitespace skip is 0x09 0x0A 0x0C 0x0D 0x20 — Spark's
    # ltrim strips spaces only, so spell the class out
    trimmed = F.upper(F.regexp_replace(head, r"^[\t\n\f\r ]+", ""))
    html = None
    for p in _HTML_PREFIXES:
        cond = trimmed.startswith(p)
        html = cond if html is None else (html | cond)

    expr = F.when(html, F.lit("text/html"))
    for mime, hx in _MAGIC:
        expr = expr.when(has_magic(hx), F.lit(mime))
    # printable-ASCII first byte → text; anything else is opaque
    first = F.hex(F.substring(payload, 1, 1))
    printable = (
        ((first >= "20") & (first <= "7E")) | first.isin("09", "0A", "0D")
    )
    return expr.when(
        F.length(payload) == 0, F.lit("application/octet-stream")
    ).when(printable, F.lit("text/plain")).otherwise(
        F.lit("application/octet-stream")
    )


def mime_mismatch_report(
    df: DataFrame, payload_col: str = "payload", declared_col: str = "declared"
) -> DataFrame:
    """(payload, declared) → per (declared, sniffed) routing matrix with
    mismatch counts — the audit a pipeline runs before trusting headers.
    One map-side-combined groupBy; the sniff itself never shuffles."""
    sniffed = sniff_mime(F.col(payload_col))
    return (
        df.select(F.col(declared_col).alias("declared"), sniffed.alias("sniffed"))
        .groupBy("declared", "sniffed")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                (F.col("declared") != F.col("sniffed")).cast("long")
            ).cast("bigint").alias("n_mismatch"),
        )
    )


# -- charset audit: the JVM-side mirror of dom/parser.decode_html_bytes ----

_RX_META_CHARSET = (
    r'(?i)<meta[^>]*\bcharset\s*=\s*["\']?([A-Za-z0-9_\-]+)'
)


def charset_report(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload charset-decision audit, whole-stage codegen.

    Mirrors the decision ladder of ``dom.parser.decode_html_bytes``
    (BOM → strict UTF-8 → <meta charset> sniff → best-effort), but as a
    pure column expression so the 100-TB corpus can be profiled for
    decode cost/risk WITHOUT running the Python decode: which pages have
    BOMs, which declare a charset, which would take the strict-UTF-8
    fast path, and which fall through to the expensive best-effort
    detector. Output: one (bom, declared, decided) routing matrix row per
    combination with counts — the prioritization input for transcode-at-
    ingest decisions.

    ``decided`` values: 'utf-8-bom' / 'utf-16le' / 'utf-16be' (BOM wins),
    'utf-8' (validates strictly), the declared charset lowercased, or
    'best-effort' (the fallback detector would run).
    """
    p = F.col(payload_col)
    hx4 = F.hex(F.substring(p, 1, 4))
    bom = (
        F.when(hx4.startswith("EFBBBF"), F.lit("utf-8-bom"))
        .when(hx4.startswith("FFFE"), F.lit("utf-16le"))
        .when(hx4.startswith("FEFF"), F.lit("utf-16be"))
    )
    head = F.decode(F.substring(p, 1, 4096), "ISO-8859-1")
    dec = F.lower(F.regexp_extract(head, _RX_META_CHARSET, 1))
    declared = F.when(dec != "", dec)
    valid_utf8 = F.is_valid_utf8(p)
    decided = (
        F.when(bom.isNotNull(), bom)
        .when(valid_utf8, F.lit("utf-8"))
        .when(declared.isNotNull(), declared)
        .otherwise(F.lit("best-effort"))
    )
    return (
        df.select(bom.alias("bom"), declared.alias("declared"), decided.alias("decided"))
        .groupBy("bom", "declared", "decided")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
