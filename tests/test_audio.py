"""WAV PCM codec: encode → decode must be lossless, corruption and
non-PCM formats rejected, and the Spark stats operator must reproduce
statistics computed independently from the closed-form waveform — with no
shuffle in the plan."""

import math
import struct

import pytest

from readability_spark.operators.audio import (
    audio_sample_stats,
    decode_wav_pcm16,
    synth_audio_params,
    synth_sample,
    synthesize_audio,
)
from readability_spark.operators.multimodal import build_wav


def _pcm(doc_id, n):
    return [synth_sample(doc_id, i) for i in range(n)]


@pytest.mark.parametrize("doc_id,n", [(0, 1), (7, 50), (123, 449)])
def test_wav_roundtrip(doc_id, n):
    samples = _pcm(doc_id, n)
    blob = build_wav(16000, n, data=struct.pack(f"<{n}h", *samples))
    rate, got = decode_wav_pcm16(blob)
    assert rate == 16000
    assert got == samples


def test_wav_rejects_malformed():
    blob = build_wav(8000, 4, data=struct.pack("<4h", 1, -2, 3, -4))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"JUNK" + blob[4:])
    # stereo rejected by the mono-PCM16 decoder
    stereo = build_wav(8000, 4, channels=2, bits=16)
    with pytest.raises(ValueError, match="mono"):
        decode_wav_pcm16(stereo)
    with pytest.raises(ValueError, match="data length"):
        build_wav(8000, 4, data=b"\x00" * 7)


def _py_stats(doc_id):
    rate, n = synth_audio_params(doc_id)
    s = _pcm(doc_id, n)
    crossings = sum(1 for i in range(n - 1) if (s[i] >= 0) != (s[i + 1] >= 0))
    return {
        "sample_rate": rate,
        "n_samples": n,
        "amp_mean": sum(s) / n,
        "rms": math.sqrt(sum(x * x for x in s) / n),
        "peak": max(abs(x) for x in s),
        "zero_crossings": crossings,
    }


def test_audio_stats_matches_formula(spark):
    ids = (0, 3, 57, 399)
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r for r in audio_sample_stats(synthesize_audio(docs)).collect()}
    for d in ids:
        want = _py_stats(d)
        r = got[d]
        assert r.ok
        assert r.sample_rate == want["sample_rate"]
        assert r.n_samples == want["n_samples"]
        assert r.amp_mean == want["amp_mean"]
        assert r.rms == want["rms"]
        assert r.peak == want["peak"]
        assert r.zero_crossings == want["zero_crossings"]


def test_audio_stats_failure_isolation(spark):
    import pandas as pd

    good = build_wav(8000, 2, data=struct.pack("<2h", 100, -100))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, b"not a wav"]})
    )
    rows = {r.doc_id: r for r in audio_sample_stats(df).collect()}
    assert rows[1].ok and rows[1].n_samples == 2 and rows[1].zero_crossings == 1
    assert not rows[2].ok and rows[2].rms is None


def test_audio_stats_plan_has_no_shuffle(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        audio_sample_stats(synthesize_audio(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- resample


def _py_resample(doc_id, target=8000):
    rate, n = synth_audio_params(doc_id)
    k = rate // target
    samples = [synth_sample(doc_id, i) for i in range(n)]
    return [sum(samples[j * k : (j + 1) * k]) // k for j in range(n // k)]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 50, 399])
def test_resample_matches_pure_python(doc_id):
    from readability_spark.operators.audio import resample_box_pcm16

    rate, n = synth_audio_params(doc_id)
    samples = [synth_sample(doc_id, i) for i in range(n)]
    k = rate // 8000
    assert resample_box_pcm16(samples, k) == _py_resample(doc_id)
    # identity when already at target rate
    assert resample_box_pcm16(samples, 1) == samples


def test_audio_resample_roundtrip_spark(spark):
    """resample -> re-encode -> decode equals the independent replay across
    all three synthesized rates (8/16/24 kHz -> k = 1/2/3)."""
    from readability_spark.operators.audio import audio_resample, synthesize_audio

    docs = spark.createDataFrame([(i,) for i in (0, 1, 2, 5, 7)], "doc_id long")
    out = {r.doc_id: r for r in audio_resample(synthesize_audio(docs)).collect()}
    for d, r in out.items():
        rate, n = synth_audio_params(d)
        assert r.ok and (r.src_rate, r.out_rate, r.n_in) == (rate, 8000, n)
        got_rate, got = decode_wav_pcm16(bytes(r.payload))
        assert got_rate == 8000
        assert got == _py_resample(d)


def test_audio_resample_failure_isolation(spark):
    import pandas as pd

    from readability_spark.operators.audio import audio_resample

    rate, n = synth_audio_params(1)
    pcm = struct.pack(f"<{n}h", *(synth_sample(1, i) for i in range(n)))
    good = build_wav(rate, n, data=pcm)
    odd_rate = build_wav(11025, n, data=pcm)  # not a multiple of 8000
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "payload": [good, b"notwav", odd_rate]})
    )
    rows = {r.doc_id: r for r in audio_resample(df).collect()}
    assert rows[1].ok and rows[1].payload is not None
    assert not rows[2].ok and rows[2].payload is None
    assert not rows[3].ok and rows[3].payload is None


def test_audio_stats_zero_sample_wav_is_isolated(spark):
    """A structurally valid WAV whose data chunk is empty decodes to zero
    samples; the stats operator must emit ok=False, not raise (ADVICE r3)."""
    import pandas as pd

    empty = build_wav(8000, 0, data=b"")
    good = build_wav(8000, 2, data=struct.pack("<2h", 100, -100))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [empty, good]})
    )
    rows = {r.doc_id: r for r in audio_sample_stats(df).collect()}
    assert not rows[1].ok and rows[1].n_samples is None
    assert rows[2].ok and rows[2].n_samples == 2


def _py_fingerprint(doc_id):
    """Pure-python reference of the 64-bit sign-of-energy-delta hash."""
    _rate, n = synth_audio_params(doc_id)
    energy = [0] * 65
    for i in range(n):
        s = synth_sample(doc_id, i)
        energy[(i * 65) // n] += s * s
    bits = [energy[b + 1] > energy[b] for b in range(64)]
    lo = sum(1 << j for j in range(32) if bits[j])
    hi = sum(1 << j for j in range(32) if bits[32 + j])
    return hi, lo


def test_audio_fingerprint_matches_formula(spark):
    from readability_spark.operators.audio import audio_fingerprint

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    rows = {r.doc_id: r for r in audio_fingerprint(synthesize_audio(docs)).collect()}
    assert len(rows) == 40
    for d, r in rows.items():
        assert r.ok
        assert (r.fp_hi, r.fp_lo) == _py_fingerprint(d)


def test_audio_fingerprint_failure_isolation(spark):
    import pandas as pd

    from readability_spark.operators.audio import audio_fingerprint

    rate, n = synth_audio_params(5)
    pcm = struct.pack(f"<{n}h", *(synth_sample(5, i) for i in range(n)))
    good = build_wav(rate, n, data=pcm)
    empty = build_wav(8000, 0, data=b"")  # zero samples: no deltas to sign
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "payload": [good, b"notwav", empty]})
    )
    rows = {r.doc_id: r for r in audio_fingerprint(df).collect()}
    assert rows[1].ok and rows[1].fp_hi is not None
    assert not rows[2].ok and rows[2].fp_hi is None
    assert not rows[3].ok and rows[3].fp_hi is None


def test_audio_near_dup_finds_injected_copies(spark):
    # Byte-identical WAV copies (doc_id + offset, same payload) must come
    # back as hamming-0 pairs, and the banded join must agree exactly with
    # a brute-force popcount over all fingerprint pairs (pigeonhole:
    # hamming<=3 ⇒ at least one 16-bit band equal).
    from pyspark.sql import functions as F

    from readability_spark.operators.audio import audio_fingerprint, audio_near_dup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    wavs = synthesize_audio(docs)
    copies = wavs.filter((F.col("doc_id") % 10) == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    fp = audio_fingerprint(wavs.unionByName(copies)).localCheckpoint()
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup(fp).collect()
    }
    sigs = [
        (r["doc_id"], r["fp_hi"], r["fp_lo"])
        for r in fp.select("doc_id", "fp_hi", "fp_lo").collect()
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


def test_fingerprint_property_arbitrary_pcm():
    """Property: for ANY non-empty int16 sequence, the shared bit-math
    helper agrees with a naive per-sample reference (frame of sample i is
    (i*65)//n, bit b = E[b+1] > E[b]), halves stay in [0, 2^32), and a
    WAV round trip through the real codec preserves the fingerprint."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from readability_spark.operators.audio import FP_FRAMES, fingerprint_pcm16

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=300))
    def check(samples):
        n = len(samples)
        energy = [0] * FP_FRAMES
        for i, s in enumerate(samples):
            energy[(i * FP_FRAMES) // n] += s * s
        bits = [energy[b + 1] > energy[b] for b in range(64)]
        want = (
            sum(1 << j for j in range(32) if bits[32 + j]),
            sum(1 << j for j in range(32) if bits[j]),
        )
        got = fingerprint_pcm16(samples)
        assert got == want
        assert 0 <= got[0] < 2**32 and 0 <= got[1] < 2**32
        blob = build_wav(8000, n, data=struct.pack(f"<{n}h", *samples))
        _rate, decoded = decode_wav_pcm16(blob)
        assert fingerprint_pcm16(decoded) == got

    check()


def test_fingerprint_rejects_empty():
    import pytest as _pytest

    from readability_spark.operators.audio import fingerprint_pcm16

    with _pytest.raises(ValueError):
        fingerprint_pcm16([])
