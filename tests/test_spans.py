"""Duplicate-span detection (Lee et al. 2022 ExactSubstr, windowed
formulation): the Spark operator must reproduce an independent pure-python
implementation, merge adjacent duplicated windows into maximal spans, and
count within-document repeats like the paper does."""

from readability_spark.operators.spans import duplicate_ngram_spans


def _py_spans(docs, k, min_count=2):
    """docs: dict doc_id -> text. Independent reference using real window
    strings (no hashing — a 60-bit md5 collision in the operator would show
    up as a mismatch here)."""
    counts = {}
    wins = {}
    for d, text in docs.items():
        toks = text.split(" ")
        ws = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ] if len(toks) >= k else []
        wins[d] = ws
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    out = []
    for d, ws in wins.items():
        marked = [i for i, w in enumerate(ws) if counts[w] >= min_count]
        run = []
        for p in marked + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.append((d, run[0], run[-1] + k - 1, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return sorted(out)


def _collect(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_dup_windows) for r in df.collect()
    )


def test_spans_match_pure_python_crafted(spark):
    docs = {
        # 1 and 2 share "the quick brown fox jumps over the lazy dog" — a
        # 9-token run of duplicated 3-windows that must merge to ONE span
        1: "the quick brown fox jumps over the lazy dog said nobody ever",
        2: "once more the quick brown fox jumps over the lazy dog appeared",
        # 3 repeats a phrase WITHIN one doc — both occurrences marked
        3: "alpha beta gamma delta zzz yyy xxx alpha beta gamma delta end",
        # 4 shares nothing
        4: "completely unrelated words with no overlap at all here now",
        # 5 is shorter than k -> contributes nothing
        5: "tiny doc",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = _collect(duplicate_ngram_spans(df, k=3))
    want = _py_spans(docs, k=3)
    assert got == want
    by_doc = {}
    for d, s, e, n in got:
        by_doc.setdefault(d, []).append((s, e, n))
    # the shared 9-token phrase is one maximal span in each doc (7 windows
    # of 3 tokens covering indices of the phrase), not 7 single-window rows
    assert len(by_doc[1]) == 1 and by_doc[1][0][2] == 7
    assert len(by_doc[2]) == 1 and by_doc[2][0][2] == 7
    # within-doc repetition found twice
    assert len(by_doc[3]) == 2
    assert 4 not in by_doc and 5 not in by_doc


def test_spans_match_pure_python_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = _collect(duplicate_ngram_spans(docs, k=8))
    want = _py_spans(rows, k=8)
    assert got == want
    assert len(got) > 0  # the synthetic corpus has injected duplicates


def test_spans_min_count_threshold(spark):
    docs = {
        1: "a b c d e f",
        2: "x a b c d y",
        3: "z a b c d w",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    # "a b c d" appears 3x; with min_count=3 it is still found...
    assert len(_collect(duplicate_ngram_spans(df, k=4, min_count=3))) == 3
    # ...but nothing appears 4 times
    assert _collect(duplicate_ngram_spans(df, k=4, min_count=4)) == []


def test_winnow_shared_substring_guarantee(spark):
    from readability_spark.operators.spans import winnow_fingerprints, WINNOW_K, WINNOW_W

    # two docs sharing a run of w+k-1 = 6 tokens must share >= 1 fingerprint
    shared = "q w e r t y"
    docs = spark.createDataFrame(
        [
            (1, f"a b c d {shared} zz xx cc vv"),
            (2, f"mm nn oo {shared} pp qq rr ss tt"),
            (3, "totally different tokens only here nothing alike at all"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "winnowing guarantee violated"
    assert not (by_doc[1] & by_doc[3])
    # density: the paper's expectation is 2/(w+1) fingerprints per hash
    n_sel = len([r for r in rows if r["doc_id"] == 1])
    assert 1 <= n_sel <= 14  # 14 tokens -> 12 grams, far fewer selections


def test_winnow_rightmost_min_tie_break(spark):
    from readability_spark.operators.spans import winnow_fingerprints

    # identical repeated grams: every window's min hash ties across all
    # positions; the paper picks the RIGHTMOST, so selected positions are
    # the LAST index of each window (pos = w-1, then one per slide)
    docs = spark.createDataFrame([(1, " ".join(["x"] * 12))], "doc_id long, text string")
    rows = winnow_fingerprints(docs).collect()
    poss = sorted(r["pos"] for r in rows)
    # windows of grams 0..9, w=4: window s selects pos s+3 (rightmost)
    assert poss == [3, 4, 5, 6, 7, 8, 9]


def test_winnow_pairs_finds_fragment_overlap(spark):
    from readability_spark.operators.dedup import FRAG_OFFSET, with_injected_fragments
    from readability_spark.operators.spans import winnow_pairs
    from readability_spark.operators.textstats import load_documents

    from pyspark.sql import functions as F

    docs = with_injected_fragments(load_documents(spark, "/root/testdata/sf0.001"))
    pairs = {
        (r["id_a"], r["id_b"]): r["overlap"] for r in winnow_pairs(docs).collect()
    }
    frag_ids = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") >= FRAG_OFFSET).select("doc_id").collect()
    ]
    assert frag_ids
    found = sum(1 for f in frag_ids if (f - FRAG_OFFSET, f) in pairs)
    # short fragments can carry < min_shared fingerprints (by design);
    # the bulk of fragment/parent pairs must still surface
    assert found >= len(frag_ids) * 0.8
    for f in frag_ids:
        key = (f - FRAG_OFFSET, f)
        if key in pairs:
            # the fragment's fingerprints are (nearly) a subset of the
            # parent's: containment-style overlap is high
            assert pairs[key] >= 0.8, (key, pairs[key])


# ---------------------------------------------------------------------------
# remove_duplicate_spans: ExactSubstr with removal
# ---------------------------------------------------------------------------

def _py_remove(docs, k, min_count=2):
    """Independent pure-python mirror: real window strings, (doc_id, p)
    survivor election, position-coverage removal, per-doc reassembly."""
    occ = {}
    toks = {d: t.split(" ") for d, t in docs.items()}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - k + 1):
            occ.setdefault(" ".join(ts[p : p + k]), []).append((d, p))
    removed = {d: set() for d in toks}
    for w, lst in occ.items():
        if len(lst) < min_count:
            continue
        for d, p in sorted(lst)[1:]:
            removed[d].update(range(p, p + k))
    out = {}
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in removed[d]]
        out[d] = (" ".join(kept), len(kept), len(ts) - len(kept))
    return out


def _collect_removal(df):
    return {
        r.doc_id: (r.text_clean, r.n_tokens_kept, r.n_tokens_removed)
        for r in df.collect()
    }


def test_remove_duplicate_spans_crafted(spark):
    from readability_spark.operators.spans import remove_duplicate_spans

    docs = {
        1: "a b c d e f g h",          # survivor of the full-dup pair
        2: "a b c d e f g h",          # full dup: collapses to ''
        3: "p q r s t u v w x y z",    # unique: untouched
        4: "m n a b c d e f o k l j",  # embeds doc 1's 6-token prefix
        5: "short doc",                # shorter than the window
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = _collect_removal(remove_duplicate_spans(df, length=6))
    want = _py_remove(docs, 6)
    assert got == want
    # the invariants a reader expects from the crafted corpus:
    assert got[2][0] == ""                      # non-survivor full dup emptied
    assert got[3] == (docs[3], 11, 0)           # unique doc untouched
    assert got[5] == (docs[5], 2, 0)            # sub-window doc untouched
    # doc 4 lost exactly the overlapping duplicated windows' coverage
    assert got[4][1] + got[4][2] == len(docs[4].split(" "))


def test_remove_duplicate_spans_corpus(spark):
    from readability_spark.operators.spans import remove_duplicate_spans

    # pseudo-random small-vocab corpus: plenty of organic window collisions
    docs = {
        d: " ".join(f"w{(d * 13 + i * 7) % 11}" for i in range(30))
        for d in range(12)
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = _collect_removal(remove_duplicate_spans(df, length=6))
    assert got == _py_remove(docs, 6)
