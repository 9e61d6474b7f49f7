"""MIME magic-byte sniffing (operators/mime.py) and redirect-chain
resolution by pointer doubling (urltools.resolve_redirects) vs a
brute-force Python walk."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


CASES = [
    (b"%PDF-1.7 blah", "application/pdf"),
    (bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png"),
    (bytes.fromhex("FFD8FFE1") + b"exif", "image/jpeg"),
    (b"GIF89a....", "image/gif"),
    (b"GIF87a....", "image/gif"),
    (bytes.fromhex("1F8B08") + b"z", "application/gzip"),
    (b"PK\x03\x04zipfile", "application/zip"),
    (b"WARC/1.1\r\n", "application/warc"),
    (b"RIFF....WAVE", "audio/wav"),
    (b"\n\t  <!doctype html><p>x", "text/html"),
    (b"<HTML><body>", "text/html"),
    (b"  <!-- c --><div>", "text/html"),
    (b"just some words", "text/plain"),
    (b"\x00\x01\x02", "application/octet-stream"),
    (b"", "application/octet-stream"),
    # invalid UTF-8 after a text-ish first byte must not fail the decode
    (b"a\xff\xfe\xfd", "text/plain"),
]


def test_sniff_mime_signature_table(spark):
    from readability_spark.operators.mime import sniff_mime

    df = spark.createDataFrame(
        [(i, payload) for i, (payload, _) in enumerate(CASES)],
        "i int, payload binary",
    )
    got = {
        r.i: r.m
        for r in df.select("i", sniff_mime(F.col("payload")).alias("m")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]} != {want}"


def test_mime_mismatch_report_counts(spark):
    from readability_spark.operators.mime import mime_mismatch_report

    rows = [
        (b"%PDF-1.4", "application/pdf"),   # honest
        (b"%PDF-1.4", "text/html"),         # lie
        (b"<html>hi", "text/html"),         # honest
        (b"<html>hi", "text/plain"),        # lie
        (b"<html>hi", "text/plain"),        # lie (same cell)
    ]
    df = spark.createDataFrame(rows, "payload binary, declared string")
    got = {
        (r.declared, r.sniffed): (r.n, r.n_mismatch)
        for r in mime_mismatch_report(df).collect()
    }
    assert got[("application/pdf", "application/pdf")] == (1, 0)
    assert got[("text/html", "application/pdf")] == (1, 1)
    assert got[("text/html", "text/html")] == (1, 0)
    assert got[("text/plain", "text/html")] == (2, 2)


def _walk(edges: dict, src, max_hops=16):
    cur, hops = edges[src], 1
    while cur in edges and hops <= max_hops:
        cur = edges[cur]
        hops += 1
    if cur in edges:
        return None, None, True
    return cur, hops, False


def test_resolve_redirects_matches_bruteforce(spark):
    from readability_spark.operators.urltools import resolve_redirects

    # chains of depth 0..7 toward multiples of 8; 2-cycle at the bottom of
    # every 40-aligned group
    edges = {n: n - 1 for n in range(1, 200) if n % 8 != 0}
    edges.update({n: n + 1 for n in range(0, 200, 40)})
    df = spark.createDataFrame(list(edges.items()), "src long, dst long")
    got = {
        r.node: (r.final, r.hops, r.looped)
        for r in resolve_redirects(df, max_hops=16).collect()
    }
    assert set(got) == set(edges)
    for src in edges:
        assert got[src] == _walk(edges, src), f"src={src}"


def test_resolve_redirects_long_chain_and_hop_cap(spark):
    from readability_spark.operators.urltools import resolve_redirects

    # one straight 12-hop chain resolves exactly (doubling overshoot must
    # freeze at the terminal, not inflate hop counts)
    edges = [(i, i - 1) for i in range(1, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.final, r.hops, r.looped) for r in resolve_redirects(df).collect()}
    assert got[12] == (0, 12, False)
    assert got[1] == (0, 1, False)
    # a 40-hop chain exceeds max_hops=16 and is flagged, not resolved
    long_edges = [(i, i - 1) for i in range(1, 41)]
    df2 = spark.createDataFrame(long_edges, "src long, dst long")
    got2 = {r.node: r.looped for r in resolve_redirects(df2, max_hops=16).collect()}
    assert got2[40] is True
    assert got2[5] is False


def test_resolve_redirects_partition_independent(spark):
    from readability_spark.operators.urltools import resolve_redirects

    edges = [(n, n - 1) for n in range(1, 100) if n % 8 != 0] + [
        (n, n + 1) for n in range(0, 100, 40)
    ]
    a = resolve_redirects(
        spark.createDataFrame(edges, "src long, dst long").repartition(3)
    )
    b = resolve_redirects(
        spark.createDataFrame(edges, "src long, dst long").repartition(17)
    )
    ra = {r.node: (r.final, r.hops, r.looped) for r in a.collect()}
    rb = {r.node: (r.final, r.hops, r.looped) for r in b.collect()}
    assert ra == rb


def test_charset_report_routing(spark):
    from readability_spark.operators.mime import charset_report

    rows = [
        (b"\xef\xbb\xbfhello",),                       # utf-8 BOM
        (b"plain ascii",),                              # strict utf-8
        ("héllo".encode("utf-8"),),                     # multibyte but valid
        (b'<meta charset="iso-8859-1">\xe9tude',),      # declared, invalid utf-8
        (b"\xff\xfeh\x00i\x00",),                       # utf-16le BOM
        (b"\xfe\xffzz",),                               # utf-16be BOM
        (b"\xff\x00\xfe",),                             # invalid, undeclared
    ]
    df = spark.createDataFrame(rows, "payload binary")
    got = {
        (r.bom, r.declared, r.decided): r.n for r in charset_report(df).collect()
    }
    assert got == {
        ("utf-8-bom", None, "utf-8-bom"): 1,
        (None, None, "utf-8"): 2,
        (None, "iso-8859-1", "iso-8859-1"): 1,
        ("utf-16le", None, "utf-16le"): 1,
        ("utf-16be", None, "utf-16be"): 1,
        (None, None, "best-effort"): 1,
    }


def test_heading_outline_walk(spark):
    from readability_spark.operators.tables import heading_outline

    df = spark.createDataFrame(
        [
            ("a", "<html><body><h1>T</h1><h2>S1</h2><h2>S2</h2><h3>x</h3></body></html>"),
            ("b", "<html><body><h1>Only</h1><h3>skipped</h3></body></html>"),
            ("c", "<html><body><p>no headings</p></body></html>"),
        ],
        "url string, html string",
    )
    got = {r.url: r for r in heading_outline(df).collect()}
    a = got["a"]
    assert (a.n_h1, a.n_h2, a.n_h3, a.n_headings) == (1, 2, 1, 4)
    assert a.max_level == 3 and a.first_h1 == "T" and a.skips_levels is False
    b = got["b"]
    assert b.skips_levels is True and b.max_level == 3 and b.n_h2 == 0
    c = got["c"]
    assert c.n_headings == 0 and c.max_level is None and c.first_h1 is None
    assert c.skips_levels is False
