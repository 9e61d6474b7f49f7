"""Encoding-damage detection + mojibake repair: known-damage strings get
exact signal counts, the repair round-trips real UTF-8→cp1252 damage back
to byte-identical originals, clean ASCII is untouched, and both operators
stay zero-shuffle projections."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.encoding import (
    INJECTIONS,
    REPAIR_TABLE,
    encoding_damage,
    mojibake,
    mojibake_repair,
    with_synthetic_mojibake,
)

pytestmark = pytest.mark.spark


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _damage_rows(spark, texts):
    rows = encoding_damage(_frame(spark, texts)).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_clean_ascii_is_undamaged(spark):
    r = _damage_rows(spark, ["plain ascii text, nothing wrong here."])[0]
    assert r["damage_total"] == 0
    assert not r["is_damaged"]
    assert r["damage_per_kchar"] == 0.0


def test_signal_counts_exact(spark):
    texts = [
        "bad �� decode",          # 2 replacement chars
        mojibake("café"),                    # one 2-byte artifact (Ã©)
        mojibake("it’s"),                    # one 3-byte artifact (â€™)
        "a &amp;amp; b &amp;#34; c",         # two double-escaped entities
        "left &#8217; over &#160;",          # two numeric-entity residues
        "raw \x85 and \x92 controls",        # two C1 controls
        mojibake("ok 😀🎉"),                 # two 4-byte (emoji) artifacts
    ]
    rows = _damage_rows(spark, texts)
    assert rows[0]["n_fffd"] == 2 and rows[0]["damage_total"] == 2
    assert rows[1]["n_moji2"] == 1
    assert rows[2]["n_moji3"] == 1
    assert rows[3]["n_dbl_entity"] == 2 and rows[3]["n_entity_residue"] == 0
    assert rows[4]["n_entity_residue"] == 2 and rows[4]["n_dbl_entity"] == 0
    assert rows[5]["n_c1"] == 2
    assert rows[6]["n_moji4"] == 2
    # emoji artifacts never bleed into the 2/3-byte counts (disjoint leads)
    assert rows[6]["n_moji2"] == 0 and rows[6]["n_moji3"] == 0
    for i in range(7):
        assert rows[i]["is_damaged"]


def test_damage_rate_quantized(spark):
    # 1 artifact over 10 chars -> 100 per kchar exactly
    r = _damage_rows(spark, ["aaaaaaaa" + mojibake("é")])[0]
    assert r["n_chars"] == 10
    assert r["damage_per_kchar"] == 100.0


def test_repair_round_trips_real_damage(spark):
    originals = [
        "don’t “quote” – dash — here… and • bullets",
        "café déjà vu naïve façade über señor",
        "priced £5 — ©2024 ®™ ½ ¾ °C ±1 Œuvre Škoda",
        "great 😀 party 🎉 love ❤ it 🙏",
        "no damage at all, plain ascii.",
    ]
    damaged = [mojibake(s) for s in originals[:4]] + [originals[4]]
    out = {
        r["doc_id"]: r.asDict()
        for r in mojibake_repair(_frame(spark, damaged)).collect()
    }
    for i, orig in enumerate(originals):
        assert out[i]["text_repaired"] == orig, (i, out[i]["text_repaired"])
    for i in range(4):
        assert out[i]["changed"]
    assert not out[4]["changed"] and out[4]["chars_removed"] == 0


def test_repair_single_pass_on_double_mojibake(spark):
    # Doubly damaged text repairs exactly one layer per application.
    once = mojibake("’")
    twice = mojibake(once)
    out = mojibake_repair(_frame(spark, [twice])).collect()[0]
    assert out["text_repaired"] == once


def test_repair_table_is_longest_first_and_unique():
    lens = [len(a) for a, _ in REPAIR_TABLE]
    assert lens == sorted(lens, reverse=True)
    assert len({a for a, _ in REPAIR_TABLE}) == len(REPAIR_TABLE)
    # artifacts never collide with their own outputs
    originals = {o for _, o in REPAIR_TABLE}
    assert all(a not in originals for a, _ in REPAIR_TABLE)


def test_injector_covers_every_signal(spark):
    docs = _frame(spark, ["base text"] * 8).withColumn(
        "doc_id", F.col("doc_id")
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in encoding_damage(with_synthetic_mojibake(docs)).collect()
    }
    assert rows[0]["n_moji2"] > 0
    assert rows[1]["n_moji3"] > 0
    assert rows[2]["n_dbl_entity"] > 0 and rows[2]["n_entity_residue"] > 0
    assert rows[3]["n_fffd"] > 0
    assert rows[4]["n_moji2"] > 0
    assert rows[5]["n_c1"] > 0
    assert rows[6]["n_moji4"] > 0
    assert rows[7]["damage_total"] == 0  # clean control class
    assert len(INJECTIONS) == 7


def test_plans_are_shuffle_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (encoding_damage, mojibake_repair):
        plan = (
            op(with_synthetic_mojibake(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
