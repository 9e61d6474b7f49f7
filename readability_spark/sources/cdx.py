"""Common-Crawl-style CDX(J) index source: SURT canonicalization, line
writer, and distributed line parser.

Next to the WARC payload files (``sources/warc.py``), the other on-disk
artifact of a Common-Crawl-style corpus is the **capture index**: CDXJ
lines of the public form

    <SURT key> <14-digit timestamp> <JSON blob>

    org,example)/path?q=1 20240101123456 {"url": "...", "mime":
    "text/html", "status": "200", "digest": "...", "length": "1234",
    "offset": "5678", "filename": "crawl-data/.../x.warc.gz"}

Crawl pipelines read these indexes constantly — dedup by digest before
fetching payload bytes, range-read WARC members by (filename, offset,
length), seed frontiers, diff snapshots — so the index parser and the SURT
key function are first-class operators here.

**SURT** (Sort-friendly URI Reordering Transform, the key ordering used by
OpenWayback/Common Crawl indexes): lowercase; scheme and fragment dropped;
leading ``www.`` dropped; host components reversed and comma-joined;
non-default port kept after the reversed host; ``)`` separates authority
from path+query. ``https://www.Example.ORG:443/A/B?Q=1#f`` →
``org,example)/a/b?q=1``. Implemented as pure column expressions
(:func:`surt_key`) so canonicalization runs in whole-stage codegen — at
10^12 captures the index scan+key projection never leaves the JVM.

Parsing (:func:`parse_cdx_lines`) is ``split(line, ' ', 3)`` +
``from_json`` — also pure codegen, zero shuffles, and malformed JSON
degrades to null fields on that row only (``from_json`` is null-safe), so
one corrupt line never fails a task.

The registry query synthesizes deterministic CDXJ lines from the driver's
document table (every field a closed-form function of ``doc_id``, mixed
case / ports / fragments injected to exercise each SURT rule), round-trips
them through the real parser, and recomputes ``surt_key`` from the parsed
url — all of which the DuckDB oracle mirrors closed-form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Parts of a URL this module understands (capture-index subset: http(s)).
_URL_RE = r"^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

CDX_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("status", StringType()),
        StructField("digest", StringType()),
        StructField("length", StringType()),
        StructField("offset", StringType()),
        StructField("filename", StringType()),
    ]
)


def surt_key(url: Column) -> Column:
    """SURT canonical key of ``url`` as a pure column expression.

    Rules (the OpenWayback/Common Crawl default canonicalizer's core):
    lowercase everything; drop scheme and fragment; drop one leading
    ``www.``; reverse host labels, join with ``,``; keep an explicit
    non-default port (``:80`` for http / ``:443`` for https are default);
    ``)`` then path (empty path → ``/``) then ``?query`` if present.
    """
    u = F.lower(url)
    scheme = F.regexp_extract(u, _URL_RE, 1)
    host = F.regexp_extract(u, _URL_RE, 2)
    port = F.regexp_extract(u, _URL_RE, 3)
    path = F.regexp_extract(u, _URL_RE, 4)
    query = F.regexp_extract(u, _URL_RE, 5)
    host = F.regexp_replace(host, "^www\\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, "\\.")))
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    port_part = F.when(
        (port != "") & (port != default_port), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query_part = F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit(""))
    return F.concat(rev, port_part, F.lit(")"), path_part, query_part)


def synthesize_cdx_lines(docs: DataFrame) -> DataFrame:
    """Deterministic CDXJ lines from the synthetic document table — every
    field a closed-form function of ``doc_id`` so any engine can rebuild
    the exact bytes. Mixed-case paths, ``www.`` prefixes, default and
    non-default ports, queries, and fragments are cycled in so the SURT
    rules all fire. Returns ``(doc_id, line)``."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    host = F.concat(www, F.lit("h"), (d % 7).cast("string"), F.lit(".example.org"))
    port = (
        F.when(d % 11 == 0, F.lit(":8080"))
        .when((d % 13 == 0) & (d % 2 == 0), F.lit(":443"))
        .when((d % 13 == 0) & (d % 2 == 1), F.lit(":80"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/Dir"), (d % 4).cast("string"), F.lit("/Page"), d.cast("string"),
        F.lit(".html"),
    )
    query = F.when(d % 5 == 0, F.concat(F.lit("?Q="), (d % 9).cast("string"))).otherwise(
        F.lit("")
    )
    frag = F.when(d % 7 == 0, F.lit("#Sec1")).otherwise(F.lit(""))
    url = F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    ts14 = F.concat(
        F.lit("202401"),
        F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
        F.lpad((d % 24).cast("string"), 2, "0"),
        F.lpad((d % 60).cast("string"), 2, "0"),
        F.lpad(((d * 7) % 60).cast("string"), 2, "0"),
    )
    blob = F.to_json(
        F.struct(
            url.alias("url"),
            F.lit("text/html").alias("mime"),
            F.when(d % 17 == 0, F.lit("404")).otherwise(F.lit("200")).alias("status"),
            F.md5(F.col("text")).alias("digest"),
            F.length("text").cast("string").alias("length"),
            (d * 1024).cast("string").alias("offset"),
            F.concat(
                F.lit("crawl-data/seg-"), (d % 16).cast("string"), F.lit(".warc.gz")
            ).alias("filename"),
        )
    )
    return docs.select(
        "doc_id", F.concat_ws(" ", surt_key(url), ts14, blob).alias("line")
    )


def parse_cdx_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ ``line`` rows into typed capture records. Pure projection
    (split + from_json + casts): no shuffle, malformed JSON → null fields
    on that row. Also recomputes ``surt_recalc = surt_key(url)`` so an
    index whose stored key disagrees with its url is detectable
    (``surt_matches``)."""
    parts = F.split(F.col(line_col), " ", 3)
    # try_element_at: a truncated line (fewer than 3 space-separated parts)
    # must yield null fields, not an ANSI INVALID_ARRAY_INDEX task failure.
    j = F.from_json(F.try_element_at(parts, F.lit(3)), CDX_JSON_SCHEMA)
    url = j["url"]
    return lines.select(
        *[c for c in lines.columns if c != line_col],
        F.try_element_at(parts, F.lit(1)).alias("surt"),
        F.try_to_timestamp(
            F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
        ).alias("capture_ts"),
        url.alias("url"),
        j["mime"].alias("mime"),
        # try_cast: real Common Crawl CDX uses '-' for status/length on
        # revisit records; ANSI cast would fail the task on such a row.
        j["status"].try_cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].try_cast("long").alias("length"),
        j["offset"].try_cast("long").alias("offset"),
        j["filename"].alias("filename"),
        (surt_key(url) == F.element_at(parts, 1)).alias("surt_matches"),
    )
