"""Gzip-JSONL shard sink/source (sources/jsonl.py): roundtrip identity,
escaping beyond the oracle corpus, deterministic bytes, atomic writes."""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=l, source=s, text=t) for i, (l, s, t) in enumerate(rows)]
    )


NASTY = [
    ("en", "src0", 'plain words'),
    ("en", "src1", 'quote " backslash \\ slash / end'),
    ("fr", "src0", "unicode café — emoji \U0001f600"),
    ("en", "src2", "tab\tnewline\nreturn\r mixed"),
    ("", "", ""),
]


def test_roundtrip_identity_with_escapes(spark):
    """Sink -> source must be the identity for text the oracle corpus never
    exercises: JSON metachars, control chars, non-ASCII."""
    from readability_spark.sources.jsonl import build_jsonl_blobs, parse_jsonl

    docs = _docs(spark, NASTY)
    back = parse_jsonl(build_jsonl_blobs(docs, n_shards=4)).collect()
    got = {r.doc_id: (r.lang, r.source, r.text) for r in back}
    want = {i: t for i, t in enumerate(NASTY)}
    assert got == want


def test_shard_bytes_deterministic(spark):
    """Same corpus -> byte-identical blobs (pinned serialization, sorted
    lines, gzip mtime=0) — the property retries and re-runs rely on."""
    from readability_spark.sources.jsonl import build_jsonl_blobs

    docs = _docs(spark, NASTY)
    a = {r.shard_id: bytes(r.gz) for r in build_jsonl_blobs(docs, n_shards=2).collect()}
    b = {r.shard_id: bytes(r.gz) for r in build_jsonl_blobs(docs, n_shards=2).collect()}
    assert a == b
    # and the payload is genuinely gzip: decompresses to sorted jsonl
    payload = gzip.decompress(next(iter(a.values())))
    ids = [json.loads(ln)["doc_id"] for ln in payload.splitlines()]
    assert ids == sorted(ids)


def test_manifest_counts_and_payload_bytes(spark):
    """payload_bytes equals the exact byte length of the concatenated
    pinned-serialization lines, measured independently here."""
    from readability_spark.sources.jsonl import build_jsonl_shards, shard_assign

    docs = _docs(spark, NASTY)
    manifest = {r.shard_id: r for r in build_jsonl_shards(docs, n_shards=2).collect()}
    assigned = docs.select(
        "doc_id", "lang", "source", "text",
        shard_assign("doc_id", 2).alias("shard_id"),
    ).collect()
    expect: dict = {}
    for r in sorted(assigned, key=lambda r: r.doc_id):
        obj = {"doc_id": r.doc_id, "lang": r.lang, "source": r.source,
               "text": r.text}
        line = (json.dumps(obj, separators=(",", ":"), ensure_ascii=True)
                + "\n").encode()
        n, b = expect.get(r.shard_id, (0, 0))
        expect[r.shard_id] = (n + 1, b + len(line))
    got = {sid: (m.n_docs, m.payload_bytes) for sid, m in manifest.items()}
    assert got == expect
    for m in manifest.values():
        assert 0 < m.gz_bytes  # compressed stream exists


def test_atomic_write_to_out_dir(spark, tmp_path):
    from readability_spark.sources.jsonl import write_jsonl

    docs = _docs(spark, NASTY)
    out = str(tmp_path / "shards")
    manifest = write_jsonl(docs, out, n_shards=2).collect()
    files = sorted(glob.glob(os.path.join(out, "shard-*.jsonl.gz")))
    assert len(files) == len(manifest)
    assert not glob.glob(os.path.join(out, "*.inprogress"))
    total = 0
    for f in files:
        total += len(gzip.decompress(open(f, "rb").read()).splitlines())
    assert total == len(NASTY)


def test_parse_is_shuffle_free(spark):
    """The source side is a mapInPandas projection — no exchange."""
    from readability_spark.sources.jsonl import build_jsonl_blobs, parse_jsonl

    docs = _docs(spark, NASTY)
    blobs = build_jsonl_blobs(docs, n_shards=2).localCheckpoint()
    plan = parse_jsonl(blobs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
