"""Decontamination, chunk-level dedup, and Gopher quality rules."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.decontam import (
    chunk_dedup,
    decontaminate,
    with_injected_contamination,
)
from readability_spark.operators.textstats import gopher_rules

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_decontaminate_flags_injected_docs(spark, docs):
    out = decontaminate(with_injected_contamination(docs)).cache()
    rows = {r.doc_id: r for r in out.collect()}
    # benchmark docs are excluded from the output
    assert all(d % 17 != 3 for d in rows)
    # every injected doc carries the 10-token benchmark snippet -> >= 6
    # contaminated 5-gram positions, and is dropped by the 5% threshold
    injected = [r for d, r in rows.items() if d % 10 == 7]
    assert injected
    for r in injected:
        assert r.n_contaminated >= 6
        assert not r.keep
    # clean docs overwhelmingly keep (the word-soup corpus can produce a few
    # accidental 5-gram overlaps, but not a majority)
    clean = [r for d, r in rows.items() if d % 10 != 7]
    kept = sum(1 for r in clean if r.keep)
    assert kept > len(clean) * 0.9


def test_decontaminate_is_partition_independent(spark, docs):
    base = with_injected_contamination(docs)
    a = sorted(decontaminate(base.repartition(13)).collect())
    b = sorted(decontaminate(base.coalesce(1)).collect())
    assert a == b


def test_chunk_dedup_removes_exact_duplicate_docs(spark, docs):
    from readability_spark.operators.dedup import with_injected_duplicates

    out = chunk_dedup(with_injected_duplicates(docs)).cache()
    rows = {r.doc_id: r for r in out.collect()}
    # injected copies (doc_id+1000000) lose every chunk to the original
    dups = [r for d, r in rows.items() if d >= 1000000]
    assert dups
    for r in dups:
        assert r.n_kept == 0
        assert r.text_dedup == ""
    # each original counterpart survives with at least one chunk
    for d in [d for d in rows if d >= 1000000]:
        assert rows[d - 1000000].n_kept >= 1


def test_chunk_dedup_keep_first_and_reassembly(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(40))),  # 3 chunks of 16/16/8
            (2, " ".join(f"w{i}" for i in range(16)) + " unique tail here"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert rows[1].n_chunks == 3 and rows[1].n_kept == 3
    assert rows[1].text_dedup == " ".join(f"w{i}" for i in range(40))
    # doc 2's first 16 tokens duplicate doc 1's first chunk -> dropped;
    # its second (short) chunk survives
    assert rows[2].n_chunks == 2 and rows[2].n_kept == 1
    assert rows[2].text_dedup == "unique tail here"


def test_gopher_rules_mixed_case_and_symbols(spark):
    df = spark.createDataFrame(
        [
            # passes everything: 60 words incl. >=2 gopher stopwords
            (1, " ".join(["the", "be", "of"] + ["word"] * 57)),
            # too short
            (2, "the be of tiny"),
            # symbol-heavy: ellipsis + hashes push symbol ratio over 0.1
            (3, " ".join(["the", "be"] + ["###"] * 20 + ["ok..."] * 30)),
            # no required stopwords
            (4, " ".join(["word"] * 60)),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert rows[1].gopher_pass
    assert not rows[2].ok_words and not rows[2].gopher_pass
    assert not rows[3].ok_symbol and rows[3].symbol_ratio > 0.1
    assert not rows[4].ok_stop and not rows[4].gopher_pass
    # uppercase counts as alphabetic
    df2 = spark.createDataFrame([(5, " ".join(["THE", "BE"] + ["WORD"] * 58))],
                                "doc_id int, text string")
    r5 = gopher_rules(df2).collect()[0]
    assert r5.alpha_word_frac == 1.0
    # but stopword matching is exact (case-sensitive, like the oracle)
    assert r5.stopword_hits == 0


def test_corpus_build_composite_gates(spark, docs):
    """Every survivor of the composite passes each individual gate."""
    import __spark_entry__ as entry

    out = entry._q_corpus_build(spark, SF)
    rows = out.collect()
    assert rows, "composite should keep some docs"
    ids = {r.doc_id for r in rows}
    # benchmark (eval) docs never appear in the training corpus
    assert all(d % 17 != 3 for d in ids)
    # gopher word-count gate: every survivor has >= 50 words
    assert all(r.n_words >= 50 for r in rows)
    # contamination gate
    assert all(r.contamination_frac <= 0.05 for r in rows)


def test_semantic_decontaminate_flags_injected_vectors(spark):
    """Every benchmark vector injected verbatim into the training pool must
    come back keep=False with max_cosine 1.0 and its own source as the
    nearest benchmark id; organic random 64-d vectors stay well below tau
    (all kept). The benchmark side must be broadcast in the plan."""
    from readability_spark.operators.decontam import (
        BENCH_MOD,
        BENCH_REM,
        SEM_INJECT_OFFSET,
        semantic_decontaminate,
    )

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
    )
    is_bench = (F.col("vec_id") % BENCH_MOD) == BENCH_REM
    bench = emb.filter(is_bench)
    train = emb.filter(~is_bench).unionByName(
        bench.withColumn("vec_id", F.col("vec_id") + SEM_INJECT_OFFSET)
    )
    out = semantic_decontaminate(train, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    rows = {r.vec_id: r for r in out.collect()}
    n_bench = bench.count()
    injected = [r for v, r in rows.items() if v >= SEM_INJECT_OFFSET]
    assert len(injected) == n_bench and n_bench > 0
    for r in injected:
        assert not r.keep
        assert r.max_cosine == 1.0
        assert r.nearest_bench_id == r.vec_id - SEM_INJECT_OFFSET
    organic = [r for v, r in rows.items() if v < SEM_INJECT_OFFSET]
    assert organic and all(r.keep for r in organic)
