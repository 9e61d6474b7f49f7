"""Unit tests for the text-analysis operators (textstats.py) on hand-built
mixed-case rows — the synthetic corpus is all-lowercase, so these pin the
behaviors the oracle can't distinguish there."""

import pytest

from readability_spark.operators import textstats

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Hello World, this IS mixed-Case text!"),
        (2, "plain lowercase words only here"),
        (3, "the a of and to in is it on for"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_punct_ratio_ignores_case(spark, docs):
    out = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    # Row 1: punctuation chars are , - ! = 3 of 37 chars; uppercase letters
    # must NOT count as punctuation.
    assert out[1]["punct_ratio"] == pytest.approx(3 / 37, abs=1e-4)
    assert out[2]["punct_ratio"] == 0.0


def test_stopword_and_distinct_ratios(spark, docs):
    out = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert out[3]["stopword_ratio"] == 1.0
    assert out[3]["distinct_ratio"] == 1.0
    assert out[2]["stopword_ratio"] == 0.0


def test_token_stats_counts(spark, docs):
    out = {r["doc_id"]: r for r in textstats.token_stats(docs).collect()}
    assert out[2]["n_tokens"] == 5
    assert out[2]["n_chars"] == len("plain lowercase words only here")
    # subwords: ceil(len/4) per word, min 1 -> 2+3+2+1+1 = 9
    assert out[2]["n_subwords"] == 9
