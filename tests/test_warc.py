"""WARC source: record writer/parser round trip, gzip member random access
(the Common Crawl splittability property), failure isolation, and the
non-response skip."""

import zlib

import pytest
from pyspark.sql import functions as F

from readability_spark.sources.warc import (
    build_response_record,
    build_warc_record,
    iter_warc_records,
    parse_warc_files,
    synthesize_warc_files,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_iter_records_pure_python():
    """Two uncompressed records back to back parse into (headers, payload)."""
    r1 = build_response_record("http://x/a", "2025-04-04T00:00:01Z", b"<html>a</html>")
    r2 = build_warc_record(
        "metadata", b"k: v\r\n", record_id="<urn:x:1>", content_type="application/warc-fields"
    )
    recs = list(iter_warc_records(r1 + r2))
    assert len(recs) == 2
    h1, p1 = recs[0]
    assert h1["warc-type"] == "response"
    assert h1["warc-target-uri"] == "http://x/a"
    assert p1.endswith(b"<html>a</html>")
    assert recs[1][0]["warc-type"] == "metadata"


def test_roundtrip_byte_exact(spark):
    """synthesize → .warc.gz → parse recovers every page byte-identically."""
    from readability_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, SF).select(
        "url", F.md5("html").alias("want_md5"), F.length("html").alias("want_len")
    )
    parsed = parse_warc_files(synthesize_warc_files(spark, SF, n_files=8))
    got = parsed.filter("ok").select(
        "url", F.md5("html").alias("got_md5"), "n_bytes", "status", "content_type"
    )
    joined = pages.join(got, "url", "full").cache()
    n_pages = pages.count()
    assert joined.count() == n_pages  # no missing, no extra urls
    bad = joined.filter(
        (F.col("got_md5") != F.col("want_md5"))
        | (F.col("n_bytes") != F.col("want_len"))
        | (F.col("status") != 200)
        | (F.col("content_type") != "text/html; charset=UTF-8")
    ).count()
    assert bad == 0


def test_gzip_member_random_access(spark):
    """Each record is its own gzip member, so parsing can start at any member
    boundary — the property that makes a .warc.gz splittable for ranged
    reads. Drop the first two members of a file; the rest must still parse."""
    row = synthesize_warc_files(spark, SF, n_files=2).orderBy("warc_file").first()
    blob = bytes(row.content)
    # advance past two members with raw zlib (independent of our parser)
    pos = 0
    for _ in range(2):
        d = zlib.decompressobj(32 + 15)
        d.decompress(blob[pos:])
        pos = len(blob) - len(d.unused_data)
    tail_records = list(iter_warc_records(blob[pos:]))
    assert len(tail_records) == row.n_records - 2
    assert all(h["warc-type"] == "response" for h, _ in tail_records)


def test_uncompressed_roundtrip(spark):
    files = synthesize_warc_files(spark, SF, n_files=4, compress=False)
    assert files.first().warc_file.endswith(".warc")
    parsed = parse_warc_files(files).filter("ok")
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert parsed.count() == n_docs


def test_non_response_records_skipped(spark):
    """warcinfo leads every file; only response records surface as rows."""
    files = synthesize_warc_files(spark, SF, n_files=4).cache()
    per_file_written = {r.warc_file: r.n_records for r in files.collect()}
    per_file_parsed = {
        r.warc_file: r.n
        for r in parse_warc_files(files).groupBy("warc_file").agg(F.count("*").alias("n")).collect()
    }
    assert per_file_parsed == {f: n - 1 for f, n in per_file_written.items()}


def test_malformed_blob_isolates(spark):
    """A truncated blob yields one ok=false row (plus any records fully
    parsed before the corruption) — never a task failure."""
    row = synthesize_warc_files(spark, SF, n_files=2).first()
    blob = bytes(row.content)
    truncated = blob[: len(blob) - len(blob) // 3]
    df = spark.createDataFrame(
        [("good.warc.gz", blob), ("bad.warc.gz", truncated)],
        "warc_file string, content binary",
    )
    out = parse_warc_files(df).cache()
    assert out.filter("warc_file = 'bad.warc.gz' AND NOT ok").count() == 1
    assert out.filter("warc_file = 'good.warc.gz' AND NOT ok").count() == 0
    # the good blob parsed fully alongside the bad one
    assert out.filter("warc_file = 'good.warc.gz' AND ok").count() == row.n_records - 1


def test_warc_bytes_reproducible(spark):
    """gzip mtime is pinned: synthesizing twice gives identical file bytes
    (resume/retry determinism for the writer side)."""
    a = {r.warc_file: bytes(r.content) for r in synthesize_warc_files(spark, SF, n_files=4).collect()}
    b = {r.warc_file: bytes(r.content) for r in synthesize_warc_files(spark, SF, n_files=4).collect()}
    assert a == b
    assert all(v[:2] == b"\x1f\x8b" for v in a.values())  # gzip magic present


def test_extract_from_warc(spark):
    """End-to-end ingestion → extraction: html recovered from WARC records
    feeds the Readability UDF and recovers the template's exact text."""
    from readability_spark.operators.extract import extract
    from readability_spark.sources.pages import REPEAT

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    want = {
        r.url: r.want
        for r in docs.select(
            F.concat(F.lit("http://synth.fakehost/doc/"), "doc_id", F.lit(".html")).alias("url"),
            F.rtrim(F.repeat(F.concat("text", F.lit(" ")), REPEAT)).alias("want"),
        ).collect()
    }
    recs = parse_warc_files(synthesize_warc_files(spark, SF, n_files=4)).filter("ok")
    got = {
        r.url: r.text
        for r in extract(recs, include_html=False).filter(F.col("url").isin(*want)).collect()
    }
    assert got == want
