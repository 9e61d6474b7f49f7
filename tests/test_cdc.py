"""Content-defined chunking (operators/cdc.py) vs a pure-python reference:
boundary rule parity, exact text coverage, and the shift-robustness
property fixed-window chunking lacks."""

import hashlib

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _py_chunks(text, window=8, max_chars=2000):
    t = text[:max_chars]
    if not t:
        return []
    ends = [
        i
        for i in range(window, len(t) + 1)
        if hashlib.md5(t[i - window : i].encode()).hexdigest().endswith("0")
    ]
    if not ends or ends[-1] != len(t):
        ends.append(len(t))
    out, prev = [], 0
    for e in ends:
        out.append(t[prev:e])
        prev = e
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog and runs far away",
    "a" * 100,
    "short",
    "",
    "word " * 300,
    "Hello, World! " * 40 + "unique tail content here",
]


def test_cdc_chunks_match_python_reference(spark):
    from readability_spark.operators.cdc import cdc_chunks_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i long, text string"
    )
    got = {
        r.i: r.ch
        for r in df.select("i", cdc_chunks_col(F.col("text")).alias("ch")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_chunks(t), f"text {i}"
        assert "".join(got[i]) == t[:2000]  # exact coverage


def test_cdc_shift_robustness_vs_fixed_chunking(spark):
    from readability_spark.operators.cdc import cdc_chunk_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    df = spark.createDataFrame(
        [(1, base), (2, "PREFIX SHIFTS EVERYTHING " + base)],
        "doc_id long, text string",
    )
    shared = cdc_chunk_dedup(df).filter(F.col("n_docs") == 2)
    # the shifted copy still shares most chunk mass with the original
    tot = shared.agg(F.sum(F.col("chunk_chars") * F.col("n_occurrences"))).first()[0]
    assert tot is not None and tot > len(base)  # > half of the 2-doc mass realigns


def test_cdc_truncation_cap(spark):
    from readability_spark.operators.cdc import cdc_chunks_col

    long_text = "z" * 5000
    df = spark.createDataFrame([(long_text,)], "text string")
    got = df.select(cdc_chunks_col(F.col("text"), max_chars=2000).alias("ch")).first().ch
    assert "".join(got) == long_text[:2000]
