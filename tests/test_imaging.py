"""PNG pixel codec: the encode → decode round trip must be lossless across
all five PNG filter types, corruption must be detected (CRC), and the Spark
pixel-stats operator must reproduce stats computed independently from the
closed-form pixel formula — without any shuffle in the plan."""

import struct
import zlib

import pytest

from readability_spark.operators.imaging import (
    _ahash,
    build_png_gray,
    decode_png_gray,
    image_pixel_stats,
    synth_dims,
    synth_pixel,
    synthesize_images,
)


def _rows(doc_id, w, h):
    return [bytes(synth_pixel(doc_id, x, y) for x in range(w)) for y in range(h)]


@pytest.mark.parametrize(
    "w,h", [(1, 1), (1, 7), (7, 1), (3, 5), (8, 8), (40, 30), (13, 11)]
)
def test_png_roundtrip_all_filters(w, h):
    rows = _rows(99, w, h)
    blob = build_png_gray(w, h, rows)
    gw, gh, px = decode_png_gray(blob)
    assert (gw, gh) == (w, h)
    assert bytes(px) == b"".join(rows)
    if h >= 5:  # every filter type appeared (y % 5 cycling)
        raw = zlib.decompress(
            blob[blob.index(b"IDAT") + 4 : blob.rindex(b"IEND") - 8]
        )
        assert {raw[y * (w + 1)] for y in range(h)} == {0, 1, 2, 3, 4}


def test_png_corruption_detected():
    blob = bytearray(build_png_gray(5, 5, _rows(3, 5, 5)))
    idat_body = blob.index(b"IDAT") + 6
    blob[idat_body] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(blob))
    with pytest.raises(ValueError):
        decode_png_gray(b"\x89PNG\r\n\x1a\njunk")


def test_png_rejects_wrong_scanline_size():
    # valid chunks but IDAT inflates to the wrong length
    from readability_spark.operators.imaging import _chunk
    from readability_spark.operators.multimodal import _PNG_SIG

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline"):
        decode_png_gray(blob)


def _py_ahash(doc_id, w, h):
    """Independent aHash reference: plain double loops, no numpy."""
    vals = [[synth_pixel(doc_id, x, y) for x in range(w)] for y in range(h)]
    gmean = sum(map(sum, vals)) / (w * h)
    bits = 0
    for b in range(64):
        block = [
            vals[y][x]
            for y in range(h)
            for x in range(w)
            if (y * 8) // h == b // 8 and (x * 8) // w == b % 8
        ]
        if block and sum(block) / len(block) > gmean:
            bits |= 1 << b
    return bits >> 32, bits & 0xFFFFFFFF


@pytest.mark.parametrize("doc_id", [0, 7, 123, 4567])
def test_ahash_matches_pure_python(doc_id):
    import numpy as np

    w, h = synth_dims(doc_id)
    arr = np.array(
        [[synth_pixel(doc_id, x, y) for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    assert _ahash(arr, w, h) == _py_ahash(doc_id, w, h)


def test_pixel_stats_matches_formula(spark):
    docs = spark.createDataFrame([(i,) for i in (0, 5, 41, 137)], "doc_id long")
    got = {r.doc_id: r for r in image_pixel_stats(synthesize_images(docs)).collect()}
    for d in (0, 5, 41, 137):
        w, h = synth_dims(d)
        vals = [synth_pixel(d, x, y) for y in range(h) for x in range(w)]
        r = got[d]
        assert r.ok
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert r.px_mean == sum(vals) / (w * h)
        assert (r.px_min, r.px_max) == (min(vals), max(vals))
        assert (r.ahash_hi, r.ahash_lo) == _py_ahash(d, w, h)


def test_pixel_stats_failure_isolation(spark):
    import pandas as pd

    good = build_png_gray(3, 2, _rows(1, 3, 2))
    bad = bytearray(good)
    bad[20] ^= 0x01  # corrupt IHDR field -> CRC mismatch
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, bytes(bad)]})
    )
    rows = {r.doc_id: r for r in image_pixel_stats(df).collect()}
    assert rows[1].ok and rows[1].n_px == 6
    assert not rows[2].ok and rows[2].n_px is None


def test_pixel_stats_plan_has_no_shuffle(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        image_pixel_stats(synthesize_images(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- resize


def _py_resize(doc_id, src_w, src_h, out=8):
    """Independent pure-python replay of the box-average resize over the
    closed-form pixels."""
    grid = []
    for j in range(out):
        y0 = (j * src_h) // out
        y1 = max(y0 + 1, ((j + 1) * src_h) // out)
        row = []
        for i in range(out):
            x0 = (i * src_w) // out
            x1 = max(x0 + 1, ((i + 1) * src_w) // out)
            s = sum(
                synth_pixel(doc_id, x, y)
                for y in range(y0, y1)
                for x in range(x0, x1)
            )
            row.append(s // ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    return grid


@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (8, 8), (40, 30), (13, 11), (5, 23)])
def test_resize_matches_pure_python(w, h):
    import numpy as np

    from readability_spark.operators.imaging import resize_box_gray

    arr = np.frombuffer(b"".join(_rows(7, w, h)), dtype=np.uint8).reshape(h, w)
    got = [list(r) for r in resize_box_gray(arr, w, h, 8, 8)]
    assert got == _py_resize(7, w, h)


def test_image_resize_roundtrip_spark(spark):
    """resize -> re-encode -> decode must land on the independent replay,
    for downscale (w,h > 8), upscale (w,h < 8), and mixed pages."""
    from readability_spark.operators.imaging import image_resize

    docs = spark.createDataFrame([(i,) for i in (0, 3, 6, 7, 12, 39)], "doc_id long")
    out = {r.doc_id: r for r in image_resize(synthesize_images(docs)).collect()}
    for d, r in out.items():
        assert r.ok and (r.src_w, r.src_h) == synth_dims(d)
        w8, h8, px = decode_png_gray(bytes(r.payload))
        assert (w8, h8) == (8, 8)
        got = [list(px[j * 8 : (j + 1) * 8]) for j in range(8)]
        assert got == _py_resize(d, r.src_w, r.src_h)


def test_image_resize_failure_isolation(spark):
    import pandas as pd

    from readability_spark.operators.imaging import image_resize

    good = build_png_gray(3, 2, _rows(1, 3, 2))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, b"notapng"]})
    )
    rows = {r.doc_id: r for r in image_resize(df).collect()}
    assert rows[1].ok and rows[1].payload is not None
    assert not rows[2].ok and rows[2].payload is None


def test_zero_area_png_rejected_everywhere(spark):
    """A decodable zero-area PNG (width or height 0) must be treated as
    malformed: decode raises, and all three Spark operators take their
    ok=False path instead of dividing by w*h = 0 (ADVICE r3)."""
    import pandas as pd
    import pytest

    from readability_spark.operators.imaging import (
        image_pixel_stats,
        image_resize,
    )

    zero_h = build_png_gray(3, 0, [])
    zero_w = build_png_gray(0, 2, [b"", b""])
    for blob in (zero_h, zero_w):
        with pytest.raises(ValueError, match="zero-area"):
            decode_png_gray(blob)
    good = build_png_gray(3, 2, _rows(1, 3, 2))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "payload": [good, zero_h, zero_w]})
    )
    stats = {r.doc_id: r for r in image_pixel_stats(df).collect()}
    assert stats[1].ok and not stats[2].ok and not stats[3].ok
    rs = {r.doc_id: r for r in image_resize(df).collect()}
    assert rs[1].ok and not rs[2].ok and not rs[3].ok
    assert rs[2].payload is None and rs[3].payload is None


def test_image_near_dup_finds_injected_copies(spark):
    # Byte-identical copies (doc_id + offset, same payload) must come back
    # as hamming-0 pairs; a brute-force popcount over all signature pairs
    # must agree exactly with the banded join (pigeonhole: hamming<=3 ⇒
    # at least one 16-bit band equal — verify the implementation honors it).
    from pyspark.sql import functions as F

    from readability_spark.operators.imaging import image_near_dup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    imgs = synthesize_images(docs)
    copies = imgs.filter((F.col("doc_id") % 10) == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    stats = image_pixel_stats(imgs.unionByName(copies)).localCheckpoint()
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(stats).collect()
    }
    sigs = [
        (r["doc_id"], r["ahash_hi"], r["ahash_lo"])
        for r in stats.select("doc_id", "ahash_hi", "ahash_lo").collect()
    ]
    brute = {}
    for i in range(len(sigs)):
        for j in range(len(sigs)):
            (ia, hi_a, lo_a), (ib, hi_b, lo_b) = sigs[i], sigs[j]
            if ia >= ib:
                continue
            ham = bin(hi_a ^ hi_b).count("1") + bin(lo_a ^ lo_b).count("1")
            if ham <= 3:
                brute[(ia, ib)] = ham
    assert got == brute
    copy_ids = [d for d, _, _ in sigs if d >= 1000000]
    assert copy_ids and all(
        got.get((d - 1000000, d)) == 0 for d in copy_ids
    )
