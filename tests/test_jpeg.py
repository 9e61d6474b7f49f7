"""Baseline JPEG codec: exact round trip on the even-constant-block
construction, tolerance round trip on smooth content, byte stuffing,
interleaved 4:2:0 color MCUs, restart markers, malformed-payload
isolation, and the zero-shuffle operator plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from readability_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QTAB_LUMA,
    _BitWriter,
    _C,
    _canonical_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg_gray,
    synth_block_value,
    synth_jpeg_dims,
)

pytestmark = pytest.mark.spark


def _const_block_image(doc_id: int) -> np.ndarray:
    w, h = synth_jpeg_dims(doc_id)
    px = np.empty((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = synth_block_value(
                doc_id, bx, by
            )
    return px


def test_huffman_tables_are_valid_prefix_codes():
    from fractions import Fraction

    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    assert sum(DC_LUMA_BITS) == len(DC_LUMA_VALS) == 12
    for bits, vals in ((DC_LUMA_BITS, DC_LUMA_VALS), (AC_LUMA_BITS, AC_LUMA_VALS)):
        codes = _canonical_codes(bits, vals)
        assert sum(Fraction(1, 2**l) for _, l in codes.values()) <= 1  # Kraft
        assert len({(c, l) for c, l in codes.values()}) == len(codes)


def test_dct_basis_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    # DC basis row is the normalized constant vector
    assert np.allclose(_C[0], np.sqrt(1 / 8))


def test_exact_round_trip_on_even_constant_blocks():
    """The oracle construction: even-valued constant blocks survive the
    lossy codec bit-exactly (DC step 16 vs orthonormal DC coefficient 8s)."""
    for d in (0, 3, 11, 17, 41):
        px = _const_block_image(d)
        w, h, out = decode_jpeg(encode_jpeg_gray(px))
        assert (w, h) == (px.shape[1], px.shape[0])
        assert np.array_equal(out, px)


def test_smooth_gradient_small_error():
    px = np.fromfunction(lambda y, x: 60 + x + y, (40, 40)).astype(np.uint8)
    _, _, out = decode_jpeg(encode_jpeg_gray(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_byte_stuffing_bit_exact():
    """Writer stuffs 0x00 after every 0xFF entropy byte; reader must strip
    exactly those. Pinned at the bit level (0xFF bytes forced), then
    end-to-end on a noise image whose stream contains a stuffed byte."""
    from readability_spark.operators.jpeg import _BitReader

    bw = _BitWriter()
    pattern = [(0xFF, 8), (0b1, 1), (0xFFFF, 16), (0b0101, 4), (0xFF, 8), (0b011, 3)]
    for code, length in pattern:
        bw.write(code, length)
    bw.flush()
    assert bw.out.count(b"\xff\x00") >= 2, bw.out.hex()
    br = _BitReader(bytes(bw.out), 0)
    for code, length in pattern:
        assert br.bits(length) == code & ((1 << length) - 1)

    px = np.random.RandomState(0).randint(0, 256, (24, 24)).astype(np.uint8)
    b = encode_jpeg_gray(px)
    assert b"\xff\x00" in b[20:]
    w, h, out = decode_jpeg(b)  # desync would raise or corrupt wildly
    assert (w, h) == (24, 24)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 30


def test_odd_dimensions_pad_and_crop():
    px = (np.arange(13 * 21, dtype=np.int64).reshape(13, 21) % 200 + 20).astype(
        np.uint8
    )
    w, h, out = decode_jpeg(encode_jpeg_gray(px))
    assert (w, h) == (21, 13) and out.shape == (13, 21)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _encode_color_420(y_blocks: dict, mcux: int, restart: int = 0) -> bytes:
    """Test-local interleaved 4:2:0 encoder: mcux×1 MCUs, each 16×16 —
    four constant EVEN Y blocks per MCU from y_blocks[(mx, v, h)], chroma
    constant 128 (all coefficients zero). All components share the
    Annex-K luminance tables (legal). Optionally emits DRI/RSTn."""
    from readability_spark.operators.jpeg import _ZZ_FLAT

    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    out = bytearray(b"\xff\xd8")
    qzz = bytes(int(QTAB_LUMA.flat[i]) for i in _ZZ_FLAT)
    out += _seg(0xDB, b"\x00" + qzz)
    out += _seg(
        0xC0,
        b"\x08" + (16).to_bytes(2, "big") + (16 * mcux).to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    out += _seg(0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    out += _seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")

    def put_const_block(value_shifted_dc: int, pred: int) -> int:
        """DC-only block: quantized DC = s/2 for even shifted value s."""
        qdc = value_shifted_dc // 2
        size, extra = _magnitude(qdc - pred)
        code, length = dc[size]
        bw.write(code, length)
        if size:
            bw.write(extra, size)
        code, length = ac[0x00]  # EOB
        bw.write(code, length)
        return qdc

    pred_y = pred_cb = pred_cr = 0
    n = 0
    for mx in range(mcux):
        if restart and n and n % restart == 0:
            bw.flush()
            out += bw.out
            bw.out = bytearray()
            out += bytes([0xFF, 0xD0 + ((n // restart - 1) % 8)])
            pred_y = pred_cb = pred_cr = 0
        for v in range(2):
            for hh in range(2):
                s = y_blocks[(mx, v, hh)] - 128
                assert s % 2 == 0
                pred_y = put_const_block(s, pred_y)
        pred_cb = put_const_block(0, pred_cb)  # chroma 128 -> s = 0
        pred_cr = put_const_block(0, pred_cr)
        n += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_color_420_interleaved_luma_decode():
    y = {(0, 0, 0): 60, (0, 0, 1): 90, (0, 1, 0): 120, (0, 1, 1): 200}
    b = _encode_color_420(y, mcux=1)
    w, h, out = decode_jpeg(b)
    assert (w, h) == (16, 16)
    assert np.array_equal(out[:8, :8], np.full((8, 8), 60, np.uint8))
    assert np.array_equal(out[:8, 8:], np.full((8, 8), 90, np.uint8))
    assert np.array_equal(out[8:, :8], np.full((8, 8), 120, np.uint8))
    assert np.array_equal(out[8:, 8:], np.full((8, 8), 200, np.uint8))


def test_restart_markers_reset_dc_prediction():
    y = {}
    for mx in range(3):
        for v in range(2):
            for hh in range(2):
                y[(mx, v, hh)] = 40 + 20 * mx + 4 * (2 * v + hh)
    b = _encode_color_420(y, mcux=3, restart=1)
    assert b"\xff\xd0" in b or b"\xff\xd1" in b
    w, h, out = decode_jpeg(b)
    assert (w, h) == (48, 16)
    for mx in range(3):
        for v in range(2):
            for hh in range(2):
                blk = out[v * 8 : v * 8 + 8, mx * 16 + hh * 8 : mx * 16 + hh * 8 + 8]
                assert np.array_equal(
                    blk, np.full((8, 8), y[(mx, v, hh)], np.uint8)
                ), (mx, v, hh)


def test_progressive_and_malformed_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    good = encode_jpeg_gray(np.full((8, 8), 100, np.uint8))
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(progressive)


def test_decode_pixels_routes_jpeg_and_png():
    from readability_spark.operators.imaging import build_png_gray
    from readability_spark.operators.multimodal import decode_pixels

    px = _const_block_image(5)
    w, h, flat = decode_pixels(encode_jpeg_gray(px))
    assert (w, h) == (px.shape[1], px.shape[0])
    assert bytes(flat) == px.tobytes()
    rows = [bytes([y % 256] * 4) for y in range(3)]
    w, h, flat = decode_pixels(build_png_gray(4, 3, rows))
    assert (w, h) == (4, 3) and bytes(flat) == b"".join(rows)


def test_spark_jpeg_stats_malformed_isolation(spark):
    from readability_spark.operators.jpeg import jpeg_pixel_stats

    rows = [
        (1, bytearray(encode_jpeg_gray(_const_block_image(1)))),
        (2, bytearray(b"\xff\xd8garbage")),
        (3, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in jpeg_pixel_stats(df).collect()}
    assert out[1]["ok"] and out[1]["n_px"] == out[1]["width"] * out[1]["height"]
    assert not out[2]["ok"] and out[2]["px_mean"] is None
    assert not out[3]["ok"]


def test_spark_jpeg_plan_zero_shuffle(spark):
    from readability_spark.operators.jpeg import jpeg_pixel_stats, synthesize_jpegs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        jpeg_pixel_stats(synthesize_jpegs(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
