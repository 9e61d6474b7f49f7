"""Distributed BPE merge learning + unicode normalization: hand-computed
merge tables, segmentation consistency, NFC composition, and plan-shape
bounds (normalization must stay a zero-shuffle projection; one BPE round
must cost exactly one shuffle)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def toy_docs(spark):
    return spark.createDataFrame(
        [(0, "aab aab aab ab ab"), (1, "banana bandana")], ["doc_id", "text"]
    )


def test_bpe_merges_hand_computed(spark, toy_docs):
    """Corpus: aab x3, ab x2, banana, bandana.
    r1: (a,b)=5 beats (a,n)=4; r2: (a,n)=4; r3: (a,ab)=3;
    r4: (b,an)=2 ties (an,a)=2 -> lexicographically larger left wins."""
    from readability_spark.operators.bpe import bpe_vocab

    rows = sorted(bpe_vocab(toy_docs, num_merges=4).collect())
    got = [(r["round"], r["left_tok"], r["right_tok"], r["merge_count"]) for r in rows]
    assert got == [
        (1, "a", "b", 5),
        (2, "a", "n", 4),
        (3, "a", "ab", 3),
        (4, "b", "an", 2),
    ]


def test_bpe_adjacent_merge_collapses_run(spark):
    """abab must become [ab, ab] after merge (a,b) — adjacent occurrences
    share no delimiter, so one replace pass merges both (the BPE rule)."""
    from readability_spark.operators.bpe import bpe_segment, bpe_vocab

    docs = spark.createDataFrame([(0, "abab abab ab")], ["doc_id", "text"])
    merges = bpe_vocab(docs, num_merges=1)
    seg = bpe_segment(docs, merges).collect()[0]
    assert seg["tokens"] == ["ab", "ab", "ab", "ab", "ab"]
    assert seg["n_tokens"] == 5


def test_bpe_segment_applies_merge_order(spark, toy_docs):
    from readability_spark.operators.bpe import bpe_segment, bpe_vocab

    merges = bpe_vocab(toy_docs, num_merges=4)
    seg = {r["doc_id"]: r["tokens"] for r in bpe_segment(toy_docs, merges).collect()}
    # banana: b,a,n,a,n,a -> (a,n): b,an,an,a -> (b,an): ban,an,a
    assert seg[1] == ["ban", "an", "a", "ban", "d", "an", "a"]
    assert seg[0] == ["aab", "aab", "aab", "ab", "ab"]


def test_bpe_single_letter_corpus_stops_early(spark):
    """A corpus with no adjacent pairs yields zero merge rows, not an error."""
    from readability_spark.operators.bpe import bpe_vocab

    docs = spark.createDataFrame([(0, "a b c a b")], ["doc_id", "text"])
    assert bpe_vocab(docs, num_merges=3).count() == 0


def test_bpe_round_is_single_data_shuffle(spark, toy_docs):
    """One merge round moves data through exactly ONE hash exchange (the
    pair-count groupBy, map-side combined); the winner election on top adds
    only a SinglePartition exchange of one pre-reduced row per partition
    (partial_max below it). At 10^8 distinct words this is the property
    that keeps a round one small job."""
    from readability_spark.operators.bpe import _adjacent_pairs, _initial_repr, word_counts

    words = _initial_repr(word_counts(toy_docs)).localCheckpoint(eager=True)
    pc = _adjacent_pairs(words).groupBy("a", "b").agg(F.sum("cnt").alias("c"))
    winner = pc.agg(F.max(F.struct("c", "a", "b")).alias("w"))
    plan = plan_of(winner)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange") == 2, plan  # + the 1-row-per-partition final max
    assert "partial_max" in plan, plan  # global max is map-side reduced first
    assert "partial_sum" in plan, plan  # pair counts combine before the shuffle


def test_bpe_oracles_match_spark_on_toy_corpus(spark, toy_docs):
    """The unrolled DuckDB CTE oracles reproduce the Spark merge table AND
    segmentation byte-for-byte (the same comparison the round driver runs,
    but on a corpus whose answer is hand-checkable)."""
    import duckdb

    import __spark_entry__ as entrymod
    from readability_spark.operators.bpe import bpe_segment, bpe_vocab

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0,'aab aab aab ab ab'),(1,'banana bandana')) t(doc_id, text)"
    )
    merges = bpe_vocab(toy_docs, num_merges=4)
    got_vocab = sorted(tuple(r) for r in merges.collect())
    want_vocab = sorted(con.execute(entrymod._bpe_vocab_oracle(4)).fetchall())
    assert got_vocab == want_vocab

    seg = bpe_segment(toy_docs, merges).select(
        "doc_id", F.concat_ws(" ", "tokens").alias("s"), "n_tokens"
    )
    got_seg = sorted(tuple(r) for r in seg.collect())
    want_seg = sorted(con.execute(entrymod._bpe_segment_oracle(4)).fetchall())
    assert got_seg == want_seg


def test_normalize_composes_and_cleans(spark):
    from readability_spark.operators.normalize import normalize_text

    docs = spark.createDataFrame(
        [
            (0, "ab\x07  cafe\u0301 \u00a0  x"),  # BEL, runs, NBSP, e+acute
            (1, " \u212B + A\u030A + \u2126 "),  # angstrom, A+ring, ohm
            (2, "already clean"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[0]["text_norm"] == "ab caf\u00e9 x"
    assert out[1]["text_norm"] == "\u00c5 + \u00c5 + \u03a9"
    assert out[2]["text_norm"] == "already clean"
    assert out[2]["changed"] is False and out[0]["changed"] is True
    assert out[0]["n_chars_norm"] == len("ab caf\u00e9 x")


def test_normalize_plan_zero_shuffle(spark):
    from readability_spark.operators.normalize import normalize_text, with_messy_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(normalize_text(with_messy_text(docs)))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "Python" in plan  # vectorized NFC stage


def test_bpe_fertility_consistent_with_segmentation(spark):
    import math

    from pyspark.sql import functions as F

    from readability_spark.operators.bpe import bpe_fertility, bpe_segment, bpe_vocab

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_vocab(docs, num_merges=8)
    rows = {r.lang: r for r in bpe_fertility(docs, merges).collect()}
    assert set(rows) == {r.lang for r in docs.select("lang").distinct().collect()}
    seg = {r.doc_id: r.n_tokens for r in bpe_segment(docs, merges).collect()}
    base = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("w"), F.length("text").alias("c")
    ).collect()
    agg: dict = {}
    for r in base:
        d = agg.setdefault(r.lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += r.w
        d[2] += seg[r.doc_id]
        d[3] += r.c
    for lang, (nd, nw, nt, nc) in agg.items():
        got = rows[lang]
        assert (got.n_docs, got.n_words, got.n_bpe_tokens, got.n_chars) == (nd, nw, nt, nc)
        assert got.fertility == math.floor(nt / nw * 10000.0 + 0.5) / 10000.0
        assert got.chars_per_token == math.floor(nc / nt * 10000.0 + 0.5) / 10000.0
        assert got.fertility > 0.5  # letters-only tokenization still covers words
