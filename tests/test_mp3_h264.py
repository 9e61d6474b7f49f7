"""MP3 frame walker + H.264 SPS parser: round trips across the synthesis
parameter space, malformed-payload isolation, emulation-prevention-byte
insert/strip, and the zero-shuffle Spark operator plans."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _insert_epb,
    _strip_epb,
    build_sps,
    parse_sps,
    synth_sps_params,
    synthesize_sps,
    h264_sps_dims,
)
from readability_spark.operators.mp3 import (
    BITRATES_V1L3,
    SAMPLE_RATES_V1,
    build_mp3,
    frame_length,
    parse_mp3,
    synth_mp3_params,
    synthesize_mp3s,
    mp3_duration_stats,
)

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# MP3 — pure python
# ---------------------------------------------------------------------------

def test_mp3_round_trip_sweep():
    for d in range(300):
        n, br_idx, sr_idx, id3 = synth_mp3_params(d)
        b = build_mp3(n, br_idx, sr_idx, id3, d % 2)
        m = parse_mp3(b)
        br, sr = BITRATES_V1L3[br_idx], SAMPLE_RATES_V1[sr_idx]
        assert m["n_frames"] == n
        assert m["bitrate_kbps"] == br
        assert m["sample_rate"] == sr
        assert m["duration_us"] == n * 1152 * 10**6 // sr
        # byte_len closed form = the oracle's formula
        flen = frame_length(br, sr, 0)
        pads = (n + d % 2) // 2
        assert len(b) == 10 + id3 + n * flen + pads + 128


def test_mp3_padding_changes_frame_length():
    assert frame_length(128, 44100, 1) == frame_length(128, 44100, 0) + 1


def test_mp3_without_tags():
    # no ID3v2, no ID3v1 — bare frames parse too
    b = build_mp3(3, 9, 0, 0, 0)
    bare = b[10:-128]
    assert parse_mp3(bare)["n_frames"] == 3


def test_mp3_malformed_isolation():
    good = build_mp3(4, 9, 0, 0, 1)  # id3_payload=0 → frames start at 10
    cases = [
        b"",
        b"junk-not-mp3",
        b"ID3\x03\x00\x00\x00\x00\x00\x7f",         # ID3 only, no frames
        b"ID3\x03\x00\x00\x00\x00\x00\xff" + good,   # non-syncsafe size
        good[:-130],                                  # truncated final frame
        good[:10] + b"\xff\xf3" + good[12:],          # MPEG-2 version bits
        good[:10] + b"\xff\xfd" + good[12:],          # Layer II
        good[:12] + bytes([good[12] & 0x0F]) + good[13:],  # free format
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            parse_mp3(bad)


def test_mp3_rejects_vbr():
    a = build_mp3(1, 9, 0, 0, 0)[10:-128]
    b = build_mp3(1, 10, 0, 0, 0)[10:-128]
    with pytest.raises(ValueError, match="VBR"):
        parse_mp3(a + b)


# ---------------------------------------------------------------------------
# H.264 — pure python
# ---------------------------------------------------------------------------

def test_sps_round_trip_sweep():
    for d in range(300):
        mw, mh, prof, lvl, cr, cb, poc = synth_sps_params(d)
        m = parse_sps(build_sps(mw, mh, prof, lvl, cr, cb, poc))
        assert m["profile_idc"] == prof
        assert m["level_idc"] == lvl
        assert m["width"] == mw * 16 - 2 * cr
        assert m["height"] == mh * 16 - 2 * cb
        assert m["n_mbs"] == mw * mh


def test_exp_golomb_round_trip():
    w = _BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 256, 65534, 1 << 20]
    for v in vals:
        w.ue(v)
    w.rbsp_trailing()
    r = _BitReader(w.tobytes())
    assert [r.ue() for _ in vals] == vals


def test_epb_insert_strip_round_trip():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x00\x00\x02",
        b"\x00\x00\x03",          # 03 after two zeros must itself be escaped
        b"\x00\x00\x00\x00\x00",
        b"ab\x00\x00\x01cd\x00\x00",
        bytes(range(256)) + b"\x00\x00\x00" + bytes(range(256)),
    ]
    for rbsp in cases:
        nal = _insert_epb(rbsp)
        # spec guarantee: no 00 00 followed by a byte ≤ 2 anywhere, and
        # any 00 00 03 is an EPB the strip pass removes
        assert not any(
            nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] <= 2
            for i in range(len(nal) - 2)
        )
        assert _strip_epb(nal) == rbsp


def test_epb_containing_sps_parses():
    """Build a NAL whose RBSP needs emulation prevention: sps_id's ue()
    field starts byte-aligned at bit 24, so 1<<22 writes 22 zero bits =
    two full zero bytes followed by 000000 1 0 = 0x02 — the 00 00 02
    pattern the writer must escape and the parser must unescape."""
    b = build_sps(10, 8, sps_id=1 << 22)
    assert b"\x00\x00\x03" in b[5:], "EPB was not exercised"
    m = parse_sps(b)
    assert m["width"] == 160 and m["height"] == 128


def test_sps_malformed_isolation():
    good = build_sps(10, 8, 100, 40, 1, 1, 0)
    cases = [
        b"",
        b"no start code here",
        b"\x00\x00\x01",                      # empty NAL
        b"\x00\x00\x01\x41\x88\x80",          # non-SPS nal_unit_type
        b"\x00\x00\x01\xe7" + good[5:7],      # forbidden_zero_bit
        good[:8],                              # truncated mid-parse
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            parse_sps(bad)


def test_sps_crop_cannot_exceed_frame():
    with pytest.raises(ValueError, match="crop"):
        parse_sps(build_sps(2, 2, crop_right=16))


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def doc_ids(spark):
    return spark.range(0, 64).select(F.col("id").alias("doc_id"))


def test_mp3_operator(spark, doc_ids):
    rows = {r.doc_id: r for r in mp3_duration_stats(synthesize_mp3s(doc_ids)).collect()}
    assert len(rows) == 64 and all(r.ok for r in rows.values())
    n, br_idx, sr_idx, _ = synth_mp3_params(17)
    assert rows[17].n_frames == n
    assert rows[17].bitrate_kbps == BITRATES_V1L3[br_idx]


def test_h264_operator(spark, doc_ids):
    rows = {r.doc_id: r for r in h264_sps_dims(synthesize_sps(doc_ids)).collect()}
    assert len(rows) == 64 and all(r.ok for r in rows.values())
    mw, mh, prof, _, cr, _, _ = synth_sps_params(23)
    assert rows[23].width == mw * 16 - 2 * cr
    assert rows[23].profile_idc == prof


def test_malformed_payload_isolates_to_ok_false(spark):
    bad = spark.createDataFrame(
        [(0, bytearray(b"not media")), (1, bytearray(b""))],
        "doc_id long, content binary",
    )
    for op in (mp3_duration_stats, h264_sps_dims):
        out = op(bad).collect()
        assert [r.ok for r in out] == [False, False]


def test_zero_shuffle_plans(spark, doc_ids):
    for op, synth in (
        (mp3_duration_stats, synthesize_mp3s),
        (h264_sps_dims, synthesize_sps),
    ):
        plan = op(synth(doc_ids))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
