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


def test_repetition_stats_hand_computed(spark):
    rows = [
        # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> 5 grams,
        # top "a b" x3, all 5 slots duplicated
        (1, "a b a b a b"),
        # all-distinct bigrams -> no repetition
        (2, "one two three four"),
        # single token: no bigram defined -> excluded
        (3, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.repetition_stats(docs, n=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 5
    assert out[1]["top_gram_count"] == 3
    assert out[1]["top_gram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert out[1]["dup_gram_frac"] == 1.0
    assert out[2]["n_grams"] == 3
    assert out[2]["top_gram_count"] == 1
    assert out[2]["dup_gram_frac"] == 0.0


def test_repetition_flags_boilerplate_over_prose(spark):
    boiler = " ".join(["click here to subscribe"] * 20)
    prose = "the quick brown fox jumps over a lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [(1, boiler), (2, prose)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.repetition_stats(docs, n=3).collect()}
    assert out[1]["dup_gram_frac"] > 0.9 > out[2]["dup_gram_frac"]


def test_script_mix_counts_and_dominance(spark):
    from readability_spark.operators.textstats import script_mix

    docs = spark.createDataFrame(
        [
            (0, "hello world"),            # pure latin
            (1, "привет мир"),             # pure cyrillic
            (2, "ab привет"),              # cyrillic 6 > latin 2
            (3, "abc где"),                # tie 3-3 -> first listed (latin) wins
            (4, "12345 !!!"),              # no script at all
            (5, "中文 text here 中"),       # latin 8 > cjk 3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in script_mix(docs).collect()}
    assert got[0]["n_latin"] == 10 and got[0]["dominant_script"] == "latin"
    assert got[1]["n_cyrillic"] == 9 and got[1]["dominant_script"] == "cyrillic"
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[3]["n_latin"] == 3 and got[3]["n_cyrillic"] == 3
    assert got[3]["dominant_script"] == "latin"  # declaration-order tie-break
    assert got[4]["dominant_script"] == "none"
    assert got[5]["n_cjk"] == 3 and got[5]["dominant_script"] == "latin"


def test_injected_scripts_flip_dominance(spark):
    from readability_spark.operators.textstats import (
        script_mix,
        with_injected_scripts,
    )

    docs = spark.createDataFrame(
        [(i, "plain english words here", "en", "web", 24) for i in range(14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r["dominant_script"]
        for r in script_mix(with_injected_scripts(docs)).collect()
    }
    for i in range(14):
        want = "cyrillic" if i % 7 == 3 else ("cjk" if i % 7 == 5 else "latin")
        assert got[i] == want, (i, got[i])


def test_vocab_growth_exact_small(spark):
    from readability_spark.operators.textstats import vocab_growth

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b d"),
            (2, "e"),
            (3, "a a a"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["checkpoint"]: r.asDict()
        for r in vocab_growth(docs, checkpoints=(1, 2, 4, 100)).collect()
    }
    assert rows[1] == {"checkpoint": 1, "n_docs": 1, "n_token_occurrences": 3, "vocab_size": 3}
    assert rows[2] == {"checkpoint": 2, "n_docs": 2, "n_token_occurrences": 6, "vocab_size": 4}
    assert rows[4] == {"checkpoint": 4, "n_docs": 4, "n_token_occurrences": 10, "vocab_size": 5}
    # past-the-end checkpoint reports the full corpus, not an error
    assert rows[100]["vocab_size"] == 5 and rows[100]["n_docs"] == 4


def test_token_drift_flags_slice_exclusive_tokens(spark):
    from readability_spark.operators.textstats import token_drift

    # token "aaa" only in even docs (slice A), "bbb" only in odd (slice B);
    # "ccc" balanced -> near-zero drift
    rows = []
    for i in range(40):
        filler = "ccc " * 5
        rows.append((i, (filler + ("aaa" if i % 2 == 0 else "bbb")).strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_drift(docs, k=3).collect()
    toks = [r["tok"] for r in out]
    assert set(toks[:2]) == {"aaa", "bbb"}
    drift = {r["tok"]: r["drift_micro"] for r in out}
    assert drift["aaa"] > 0  # over-represented in A
    assert drift["bbb"] < 0 or abs(drift["bbb"]) > 0  # under-represented in A
    assert abs(drift.get("ccc", 0.0)) < abs(drift["aaa"])


def test_domain_quality_prior_matches_reference(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.domain: r for r in textstats.domain_quality_prior(docs).collect()}
    # independent reference of the moments + posterior math
    qs = {r.doc_id: r.quality for r in textstats.quality_score(docs).collect()}
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    per = {}
    for did, s in src.items():
        n, k = per.get(s, (0, 0))
        per[s] = (n + 1, k + (1 if qs[did] >= 0.55 else 0))
    ps = [k / n for n, k in per.values()]
    m = sum(ps) / len(ps)
    v = sum(p * p for p in ps) / len(ps) - m * m
    s_raw = m * (1.0 - m) / v - 1.0
    assert v > 1e-12 and s_raw > 0  # this corpus exercises the live path
    alpha = m * s_raw
    for dom, (n, k) in per.items():
        r = rows[dom]
        assert (r.n_docs, r.n_good) == (n, k)
        expect = (k + alpha) / (n + s_raw)
        assert abs(r.shrunk_rate - expect) < 1e-3, (dom, r.shrunk_rate, expect)
        # shrinkage pulls toward the prior mean without crossing it
        lo, hi = sorted((k / n, m))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9


def test_domain_quality_prior_flat_fallback_on_constant_rates(spark):
    # every domain has the identical rate -> zero variance -> Beta(1,1)
    docs = spark.createDataFrame(
        [(i, "word " * 10, "en", f"s{i % 4}", 50) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = textstats.domain_quality_prior(docs).collect()
    assert all(r.prior_alpha == 1.0 and r.prior_beta == 1.0 for r in rows)
    for r in rows:
        expect = (r.n_good + 1.0) / (r.n_docs + 2.0)
        assert abs(r.shrunk_rate - expect) < 1e-3


def test_corpus_card_single_row_exact(spark):
    import math

    from pyspark.sql import functions as F

    from readability_spark.operators.dedup import with_injected_duplicates

    docs = with_injected_duplicates(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    row = textstats.corpus_card(docs).collect()
    assert len(row) == 1
    r = row[0]
    base = docs.select(
        "doc_id", "lang", "source", "text", F.size(F.split("text", " ")).alias("w")
    ).collect()
    assert r.n_docs == len(base)
    assert r.n_tokens == sum(b.w for b in base)
    assert r.n_chars == sum(len(b.text) for b in base)
    assert r.n_langs == len({b.lang for b in base})
    assert r.n_sources == len({b.source for b in base})
    uniq = len({b.text for b in base})
    assert r.exact_dup_rate == math.floor(
        (len(base) - uniq) / len(base) * 10000.0 + 0.5
    ) / 10000.0
    assert r.exact_dup_rate > 0  # injected copies guarantee duplicates
    assert 0.0 < r.mean_quality < 1.0


def test_lexical_diversity_exact_and_detects_template_spam(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "buy cheap pills buy cheap pills buy cheap pills", "en", "spam", 0),
            (2, "cheap pills here buy now cheap pills buy", "en", "spam", 0),
            (3, "the quick brown fox jumps over a lazy dog tonight", "en", "prose", 0),
            (4, "every sentence introduces entirely novel vocabulary again", "en", "prose", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.grp: r for r in textstats.lexical_diversity(docs).collect()}
    # exact recompute
    from collections import Counter

    for grp in ("spam", "prose"):
        toks = []
        for r in docs.filter(f"source = '{grp}'").collect():
            toks += r.text.split(" ")
        c = Counter(toks)
        assert rows[grp].n_tokens == len(toks)
        assert rows[grp].n_types == len(c)
        assert rows[grp].n_hapax == sum(1 for v in c.values() if v == 1)
        assert rows[grp].type_token_ratio == math.floor(
            len(c) / len(toks) * 10000.0 + 0.5
        ) / 10000.0
    # the signal: template spam has far lower diversity than prose
    assert rows["spam"].type_token_ratio < 0.5 < rows["prose"].type_token_ratio
    assert rows["spam"].hapax_frac < rows["prose"].hapax_frac


def test_signal_correlation_matches_numpy_pearson(spark):
    import math

    import numpy as np

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.select("doc_id", (F.col("doc_id") % 17).cast("double").alias("s1"))
    b = docs.select(
        "doc_id",
        ((F.col("doc_id") % 17) * 2 + (F.col("doc_id") % 5)).cast("double").alias("s2"),
    )
    rows = {r.grp: r for r in textstats.signal_correlation(a, b, docs, "s1", "s2").collect()}
    base = docs.select("doc_id", "lang").collect()
    per: dict = {}
    for r in base:
        per.setdefault(r.lang, []).append(r.doc_id)
    for lang, ids in per.items():
        x = np.array([i % 17 for i in ids], dtype=float)
        y = np.array([(i % 17) * 2 + i % 5 for i in ids], dtype=float)
        expect = float(np.corrcoef(x, y)[0, 1])
        got = rows[lang]
        assert got.n_docs == len(ids)
        assert abs(got.corr - expect) < 2e-4, (lang, got.corr, expect)
        assert got.corr > 0.9  # strongly positively related by construction


def test_char_entropy_matches_bruteforce(spark):
    import math
    from collections import Counter

    from readability_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),                # zero entropy
            (2, "abab"),                # 1 bit, ratio 1.0
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "aaabbbcc d"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.char_entropy(docs).collect()}
    for doc_id, text in [(1, "aaaa"), (2, "abab"), (3, "the quick brown fox jumps over the lazy dog"), (4, "aaabbbcc d")]:
        counts = Counter(text)
        n = len(text)
        sq = sum(math.floor(c * math.log2(c) * 1e6) for c in counts.values())
        h = math.log2(n) - (sq / 1e6) / n
        got = rows[doc_id]
        assert got.n_chars == n
        assert got.n_distinct_chars == len(counts)
        assert abs(got.entropy_bits - h) < 2e-4
    assert rows[1].entropy_bits == 0.0
    assert rows[2].entropy_ratio == 1.0
    # random-ish English prose sits in the 3-4.5 bit band
    assert 3.0 < rows[3].entropy_bits < 4.5


def test_char_entropy_skips_empty(spark):
    from readability_spark.operators import textstats

    docs = spark.createDataFrame([(1, ""), (2, "ab")], "doc_id long, text string")
    assert [r.doc_id for r in textstats.char_entropy(docs).collect()] == [2]


def test_quality_calibrate_hits_keep_rate(spark):
    from readability_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = textstats.quality_threshold_calibrate(docs, keep_rate=0.4).collect()
    assert rows, "expected one row per language"
    for r in rows:
        # quantile gate keeps ~keep_rate per language (ties can push it over)
        assert 0.35 <= r.kept_rate <= 0.6, (r.lang, r.kept_rate)
        assert r.n_kept <= r.n_docs
    # a stricter keep-rate must move every language's threshold up (or equal)
    t40 = {r.lang: r.threshold for r in rows}
    t20 = {
        r.lang: r.threshold
        for r in textstats.quality_threshold_calibrate(docs, keep_rate=0.2).collect()
    }
    assert all(t20[lang] >= t40[lang] for lang in t40)


def test_quality_calibrate_approx_schema(spark):
    from readability_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.quality_threshold_calibrate(docs, keep_rate=0.5, exact=False)
    assert out.columns == ["lang", "n_docs", "threshold", "n_kept", "kept_rate"]
    assert out.count() > 0


def _read_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in textstats.readability_scores(df).collect()
    }


def test_readability_counts_hand_computed(spark):
    # "The cat sat. It ran!" -> 2 sentence runs, 5 words, 5 vowel runs
    # (The/cat/sat/It/ran each contribute one) + 0 consonant-only words.
    r = _read_rows(spark, ["The cat sat. It ran!"])[0]
    assert r["n_sentences"] == 2
    assert r["n_words"] == 5
    assert r["n_syllables"] == 5
    assert r["words_per_sentence"] == 2.5
    assert r["syllables_per_word"] == 1.0
    # FRE = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975 -> round4 exact
    assert r["flesch_reading_ease"] == 119.6975
    assert r["reading_band"] == "easy"


def test_readability_consonant_only_word_floor(spark):
    # "Dr" has no vowel run; the \b consonant-word count gives it 1 syllable.
    r = _read_rows(spark, ["Dr Smith arrived."])[0]
    assert r["n_words"] == 3
    # Smith: i run; arrived: a, i, e runs = 3; Dr: consonant-only = 1
    assert r["n_syllables"] == 5


def test_readability_band_ordering(spark):
    # Long polysyllabic prose lands in a harder band than short prose.
    easy = "He ran. She sat. It is fun. We go now."
    hard = (
        "Institutional considerations necessitate comprehensive "
        "organizational restructuring initiatives notwithstanding "
        "extraordinary administrative complexities."
    )
    rows = _read_rows(spark, [easy, hard])
    assert rows[0]["flesch_reading_ease"] > rows[1]["flesch_reading_ease"]
    assert rows[0]["reading_band"] == "easy"
    assert rows[1]["reading_band"] == "very_difficult"


def test_readability_empty_and_wordless(spark):
    rows = _read_rows(spark, ["", "12345 678", "no sentence terminator here"])
    for i in range(3):
        assert rows[i]["reading_band"] == "empty"
        assert rows[i]["flesch_reading_ease"] == 0.0
        assert rows[i]["fk_grade"] == 0.0


def test_readability_plan_is_shuffle_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textstats.readability_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def _attrition_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textstats.filter_attrition(df, stopwords=("the", "a"), quality_threshold=0.0)
    return {r["stage"]: r.asDict() for r in out.collect()}


_PASSING = (
    "the quick brown fox jumps over a lazy dog near the old river bank "
    "and the small grey cat sleeps under a warm wooden table while the "
    "young tall farmer walks along a narrow dusty road toward the quiet "
    "green valley beyond a stone bridge over the clear stream today"
)  # 50 words, all alpha, mean len in range, 'the'+'a' stop hits


def test_attrition_funnel_monotone(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.filter_attrition(docs, stopwords=("the", "a"))
    rows = sorted(out.collect(), key=lambda r: r["stage_idx"])
    assert [r["stage"] for r in rows] == list(textstats.ATTRITION_STAGES)
    docs_seq = [r["docs_kept"] for r in rows]
    toks_seq = [r["tokens_kept"] for r in rows]
    assert docs_seq == sorted(docs_seq, reverse=True)
    assert toks_seq == sorted(toks_seq, reverse=True)
    assert rows[0]["docs_rate"] == 1.0 and rows[0]["tokens_rate"] == 1.0


def test_attrition_dedup_keeps_first_survivor_only(spark):
    # doc 1 (non-en) is filtered at the lang gate; its byte-identical doc 2
    # survives — dedup must NOT let the filtered-out earlier copy shadow it.
    rows = [
        (1, _PASSING, "fr"),
        (2, _PASSING, "en"),
        (3, _PASSING, "en"),  # true surviving duplicate of 2 — dropped
    ]
    s = _attrition_rows(spark, rows)
    assert s["1_lang_en"]["docs_kept"] == 2
    assert s["3_quality"]["docs_kept"] == 2
    assert s["4_exact_dedup"]["docs_kept"] == 1


def test_attrition_empty_input_all_zero_rates(spark):
    df = spark.createDataFrame([], "doc_id long, text string, lang string")
    out = textstats.filter_attrition(df)
    rows = sorted(out.collect(), key=lambda r: r["stage_idx"])
    assert len(rows) == len(textstats.ATTRITION_STAGES)
    assert all(r["docs_kept"] == 0 and r["docs_rate"] == 0.0 for r in rows)


def test_attrition_plan_single_fp_exchange(spark):
    # One scan; the only data Exchange is the md5 window hash partitioning
    # (plus the single-partition final-agg exchange). No per-stage passes.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textstats.filter_attrition(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
