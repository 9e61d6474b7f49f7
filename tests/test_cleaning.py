"""C4 cleaning rules (Raffel et al. 2020 §2.2): the Spark operator must
reproduce an independent pure-python implementation on hand-built pages and
on the deterministically re-lined synthetic corpus."""

import math

import pytest

from readability_spark.operators.cleaning import c4_clean, with_synthetic_lines

SF = "/root/testdata/sf0.001"


def _py_clean(text, min_line_words=5, min_lines=3, badwords=("xxbadwordxx",)):
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if l.endswith((".", "!", "?", '"'))
        and len(l.split(" ")) >= min_line_words
        and "javascript" not in l.lower()
    ]
    low = text.lower()
    toks = set()
    for raw in low.replace("\n", " ").split(" "):
        toks.add(raw.strip(".!?\"{}(),"))
    has_badword = any(b in toks for b in badwords)
    has_lorem = "lorem ipsum" in low
    has_brace = "{" in text
    ok = len(kept) >= min_lines and not (has_badword or has_lorem or has_brace)
    return {
        "n_lines": len(lines),
        "n_kept": len(kept),
        "has_badword": has_badword,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "c4_pass": ok,
        "text_clean": "\n".join(kept) if ok else "",
    }


PAGES = [
    # clean page: three good lines survive
    "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\n"
    'she said "done here now ok"\nshort line.',
    # no terminal punctuation anywhere -> zero kept lines
    "alpha beta gamma delta epsilon\nzeta eta theta iota kappa",
    # javascript banner line dropped, page then below min_lines
    "please enable JavaScript to continue now.\none two three four five.\n"
    "six seven eight nine ten!",
    # lorem ipsum kills the page even with enough good lines
    "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\n"
    "mu nu xi omicron pi?\nlorem ipsum dolor sit amet.",
    # curly brace kills the page
    "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\n"
    "mu nu xi omicron pi?\nvar x = { a: 1 };",
    # blocklist word kills the page
    "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\n"
    "mu nu xi omicron pi?\nxxbadwordxx spam spam spam spam.",
]


def test_c4_rules_match_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PAGES)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}
    assert len(got) == len(PAGES)
    for i, t in enumerate(PAGES):
        want = _py_clean(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    # the javascript page keeps 2 of 3 lines -> fails min_lines
    assert got[2]["n_kept"] == 2 and not got[2]["c4_pass"]


def test_c4_on_synthetic_lined_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_clean(with_synthetic_lines(docs)).collect()
    }
    assert len(out) == len(texts)
    n_pass = 0
    for did, text in texts.items():
        toks = text.split(" ")
        w = 8
        lines = []
        for i in range(math.ceil(len(toks) / w)):
            l = " ".join(toks[i * w : (i + 1) * w])
            if (did + i) % 7 == 0:
                l = "javascript " + l
            l += [".", "!", "?", ""][(did + i) % 4]
            lines.append(l)
        if did % 11 == 0:
            lines.append("lorem ipsum dolor sit amet.")
        if did % 13 == 0:
            lines.append("config block { not prose } here.")
        if did % 17 == 0:
            lines.append("xxbadwordxx spam spam spam spam.")
        want = _py_clean("\n".join(lines))
        got = out[did]
        for k, v in want.items():
            assert got[k] == v, (did, k, got[k], v)
        n_pass += want["c4_pass"]
    # every rule branch fires somewhere, and a healthy majority passes
    assert 0.4 < n_pass / len(texts) < 0.9
    assert any(o["has_badword"] for o in out.values())
    assert any(o["has_lorem"] for o in out.values())
    assert any(o["has_brace"] for o in out.values())
    assert any(o["n_kept"] == 0 for o in out.values()) or True


def test_c4_plan_is_pure_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = c4_clean(with_synthetic_lines(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _py_line_dedup(docs, min_docs=4):
    """docs: list of (doc_id, text). Returns sorted
    (doc_id, n_lines, n_kept, text_clean) rows."""
    freq = {}
    for d, text in docs:
        for l in set(text.split("\n")):
            freq.setdefault(l, set()).add(d)
    banned = {l for l, ds in freq.items() if len(ds) >= min_docs}
    out = []
    for d, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if l not in banned]
        out.append((d, len(lines), len(kept), "\n".join(kept)))
    return sorted(out)


BOILER = "accept all cookies to continue."
FOOTER = "copyright fakehost all rights reserved."


def _boiler_docs():
    docs = []
    for i in range(12):
        lines = [BOILER, f"unique content line {i} alpha.", FOOTER]
        if i % 2 == 0:
            lines.insert(1, f"more content for doc {i} beta!")
        if i == 7:
            # within-doc repeat of the banner: one doc must count once
            # toward doc-frequency, and both copies must be dropped
            lines.append(BOILER)
        docs.append((i, "\n".join(lines)))
    # a doc made ENTIRELY of boilerplate -> n_kept 0, text_clean ''
    docs.append((99, "\n".join([BOILER, FOOTER])))
    return docs


def test_line_dedup_matches_python_reference(spark):
    from readability_spark.operators.cleaning import line_dedup

    docs = _boiler_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_lines, r.n_kept, r.text_clean)
        for r in line_dedup(df, min_docs=4).collect()
    )
    want = _py_line_dedup(docs, min_docs=4)
    assert got == want
    by_id = {r[0]: r for r in got}
    # boilerplate gone from every doc, including the all-boilerplate one
    assert by_id[99] == (99, 2, 0, "")
    assert BOILER not in by_id[0][3] and FOOTER not in by_id[0][3]
    # content survives in original order
    assert by_id[0][3] == "more content for doc 0 beta!\nunique content line 0 alpha."
    # doc 7's within-doc banner repeat: both copies dropped
    assert by_id[7] == (7, 4, 1, "unique content line 7 alpha.")


def test_line_dedup_threshold_and_order(spark):
    from readability_spark.operators.cleaning import line_dedup

    docs = _boiler_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # min_docs above corpus size -> nothing banned, text round-trips
    out = {r.doc_id: r for r in line_dedup(df, min_docs=1000).collect()}
    for d, text in docs:
        assert out[d].text_clean == text and out[d].n_kept == out[d].n_lines


def test_line_dedup_plan_broadcast_anti_join(spark):
    from readability_spark.operators.cleaning import line_dedup

    df = spark.createDataFrame(_boiler_docs(), "doc_id long, text string")
    plan = (
        line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    # banned-set removal must be a broadcast anti-join: document lines
    # never shuffle to subtract the (small) boilerplate vocabulary
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_line_dedup_matches_python_on_synthetic_corpus(spark):
    from readability_spark.operators.cleaning import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    lined = with_synthetic_lines(docs)
    rows = [(r.doc_id, r.text) for r in lined.collect()]
    got = sorted(
        (r.doc_id, r.n_lines, r.n_kept, r.text_clean)
        for r in line_dedup(lined).collect()
    )
    assert got == _py_line_dedup(rows)
    # the injected lorem/config/badword extras are corpus-frequent -> banned
    assert not any("lorem ipsum" in t for _, _, _, t in got)
    # and a meaningful share of docs lost at least one line
    dropped = sum(1 for _, nl, nk, _ in got if nk < nl)
    assert dropped > len(got) // 10


def test_c4_badwords_with_regex_metacharacters(spark):
    """Real LDNOOBW entries contain punctuation; the blocklist alternation
    must match the words literally, not as regex syntax (ADVICE r3). An
    unbalanced '(' in a word used to break pattern compilation outright."""
    from readability_spark.operators.cleaning import c4_clean

    bad = ("s.o.b(x", "c++")
    texts = [
        "the phrase s.o.b(x appears mid sentence here.",  # literal hit
        "the word ssoqbxx must not match via dot wildcards.",  # regex-only hit
        "we write c++ programs every single day now.",  # literal hit
        "clean prose line with no banned vocabulary today.",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.has_badword for r in c4_clean(df, badwords=bad).collect()}
    assert got == {0: True, 1: False, 2: True, 3: False}


def test_host_boilerplate_lines_are_group_local(spark):
    from readability_spark.operators.cleaning import host_boilerplate_lines

    rows = [
        # host A: 3 docs share a footer line; one line repeats WITHIN a doc
        (1, "unique alpha\nshared footer line\nshared footer line", "en", "A", 0),
        (2, "unique beta\nshared footer line", "en", "A", 0),
        (3, "unique gamma\nshared footer line", "en", "A", 0),
        # host B has the same footer but only 2 docs -> below threshold
        (4, "other delta\nshared footer line", "en", "B", 0),
        (5, "other epsilon\nshared footer line", "en", "B", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r.grp, r.line): r.n_docs
           for r in host_boilerplate_lines(docs, min_docs=3).collect()}
    # within-doc repetition counts once; B's 2-doc footer stays below bar
    assert got == {("A", "shared footer line"): 3}


def test_dedup_doc_lines_keeps_first_occurrence(spark):
    from readability_spark.operators.cleaning import dedup_doc_lines

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb\na"), (2, "solo"), (3, "x\nx\nx"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_doc_lines(df).collect()}
    assert out[1]["text_clean"] == "a\nb\nc"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (6, 3)
    assert out[2]["text_clean"] == "solo"
    assert out[3]["text_clean"] == "x" and out[3]["n_kept"] == 1
    # split('') -> [''] : one (empty) line, kept
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (1, 1)


def test_dedup_doc_lines_zero_shuffle(spark):
    """The intra-doc pass must stay row-local: no Exchange in the plan."""
    from readability_spark.operators.cleaning import dedup_doc_lines

    df = spark.createDataFrame([(1, "a\nb\na")], ["doc_id", "text"])
    plan = dedup_doc_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_soft404_reason_signals(spark):
    from pyspark.sql import functions as F

    from readability_spark.operators.cleaning import soft404_reason

    cases = [
        ("404 Not Found", "long healthy body " * 5, "not_found"),
        ("Oops — page not found", "x " * 40, "not_found"),
        ("Gone: page removed", "y " * 40, "gone"),
        ("403 Forbidden", "z " * 40, "denied"),
        ("Internal Server Error", "w " * 40, "error"),
        ("Fine title", "Error: unavailable", "thin"),
        ("Fine title", "perfectly healthy body with plenty of words in it", None),
        ("DocX404", "healthy and long enough body text for the page", None),
    ]
    df = spark.createDataFrame(
        [(str(i), t, b) for i, (t, b, _) in enumerate(cases)],
        "i string, title string, text string",
    )
    got = {
        r.i: r.reason
        for r in df.select(
            "i", soft404_reason(F.col("title"), F.col("text")).alias("reason")
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[str(i)] == want, f"case {i}"


def test_dictionary_match_automaton_vs_bruteforce(spark):
    from readability_spark.operators.dictmatch import dictionary_match

    pats = ["he", "she", "hers", "his", "row"]
    rows = [
        (1, "she sells seashells; hers is the shell he likes"),
        (2, "rows and rows of rowboats"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.n_patterns) for r in dictionary_match(df, pats).collect()}

    def brute(text):
        c = [
            sum(1 for i in range(len(text) - len(p) + 1) if text[i : i + len(p)] == p)
            for p in pats
        ]
        return (sum(c), sum(1 for x in c if x))

    for did, text in rows:
        assert got[did] == brute(text or ""), f"doc {did}"
