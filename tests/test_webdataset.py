"""WebDataset shard sink/source: byte determinism, manifest arithmetic,
round-trip identity, and partition-independence of shard assignment."""

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from readability_spark.sources.webdataset import (
    build_webdataset_blobs,
    build_webdataset_shards,
    parse_webdataset,
    predicted_tar_bytes,
    write_webdataset,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_manifest_matches_closed_form_arithmetic(docs):
    """tar_bytes is measured from the built archive on the Spark side; the
    closed-form formula (what the DuckDB oracle uses) must predict it
    exactly for every shard."""
    from readability_spark.sources.webdataset import shard_assign

    manifest = {
        r.shard_id: r for r in build_webdataset_shards(docs, n_shards=8).collect()
    }
    # recompute per-shard payload sizes through the same assignment column
    assigned = docs.select(
        shard_assign("doc_id", 8).alias("shard_id"),
        F.octet_length(F.coalesce("text", F.lit(""))).alias("sz"),
    ).collect()
    sizes_by_shard = {}
    for r in assigned:
        sizes_by_shard.setdefault(r.shard_id, []).append(r.sz)

    assert set(manifest) == set(sizes_by_shard)
    for sid, sizes in sizes_by_shard.items():
        m = manifest[sid]
        assert m.n_samples == len(sizes)
        assert m.payload_bytes == sum(sizes)
        assert m.tar_bytes == predicted_tar_bytes(sizes)


def test_round_trip_identity(docs):
    """build → parse must reproduce every (doc_id, text) exactly."""
    parsed = parse_webdataset(build_webdataset_blobs(docs, n_shards=8))
    got = {r.doc_id: r.text for r in parsed.collect()}
    want = {r.doc_id: (r.text or "") for r in docs.select("doc_id", "text").collect()}
    assert got == want


def test_shard_bytes_deterministic(docs):
    """Two independent builds must produce byte-identical archives —
    determinism is what makes tar_bytes oracle-able and retries safe."""
    a = {r.shard_id: bytes(r.tar) for r in build_webdataset_blobs(docs, 4).collect()}
    b = {
        r.shard_id: bytes(r.tar)
        for r in build_webdataset_blobs(docs.repartition(13), 4).collect()
    }
    assert a == b


def test_write_webdataset_files_readable(docs, tmp_path):
    """The sink's on-disk shards are plain tar files any loader can read;
    the manifest row count matches the files written, and no .inprogress
    temp files survive the atomic rename."""
    out = str(tmp_path / "shards")
    manifest = write_webdataset(docs, out, n_shards=4).collect()
    files = sorted((tmp_path / "shards").iterdir())
    assert [f.name for f in files] == [
        f"shard-{r.shard_id:05d}.tar" for r in sorted(manifest, key=lambda r: r.shard_id)
    ]
    n_members = 0
    for f in files:
        with tarfile.open(f, "r:") as tf:
            members = tf.getmembers()
            n_members += len(members)
            # members sorted by key, pinned headers
            names = [m.name for m in members]
            assert names == sorted(names)
            assert all(m.mtime == 0 and m.uid == 0 and m.gid == 0 for m in members)
    assert n_members == docs.count()


def test_predicted_tar_bytes_matches_stdlib():
    """The formula vs an actual stdlib tarfile build, including the
    zero-length-member and block-boundary edge cases."""
    for sizes in [[0], [1], [511], [512], [513], [0, 512, 10000], [1] * 25]:
        bio = io.BytesIO()
        with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for i, s in enumerate(sizes):
                ti = tarfile.TarInfo(name=f"{i:012d}.txt")
                ti.size = s
                ti.mtime = 0
                tf.addfile(ti, io.BytesIO(b"x" * s))
        assert len(bio.getvalue()) == predicted_tar_bytes(sizes), sizes
