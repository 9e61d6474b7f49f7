"""Property tests: the distributed corpus operators must agree with
brute-force single-process Python references on randomized inputs —
the properties (RFC 9309 precedence, keep-first chunk election, suffix
blocking) hold for ALL inputs, not just the synthetic corpus."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.spark

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# -- robots ------------------------------------------------------------

prefix_st = st.sampled_from(["/", "/a/", "/a/b/", "/b/", "/a/bb", "/c", ""])
rule_st = st.tuples(
    st.sampled_from(["*", "trainingbot", "otherbot"]),
    st.sampled_from(["allow", "disallow"]),
    prefix_st,
)
path_st = st.sampled_from(
    ["/a/b/c", "/a/bb/x", "/b/", "/c", "/d/e", "/a/", "/"]
)


def ref_robots_verdict(rules, path, agent="trainingbot"):
    """Brute-force RFC 9309: own group else '*'; longest match wins;
    allow beats disallow on ties; no match => allowed."""
    groups = {}
    for a, d, p in rules:
        groups.setdefault(a, []).append((d, p))
    group = groups.get(agent) or groups.get("*") or []
    matches = [(len(p), d == "allow", p) for d, p in group if p and path.startswith(p)]
    if not matches:
        return None, True
    ln, allow, pref = max(matches)
    return pref, allow


@settings(**SETTINGS)
@given(st.lists(rule_st, min_size=1, max_size=8), st.lists(path_st, min_size=1, max_size=5))
def test_robots_filter_matches_reference(spark, rules, paths):
    from readability_spark.sources.robots import robots_filter

    rules_df = spark.createDataFrame(
        [("h.com", a, d, p) for a, d, p in rules],
        "host string, agent string, directive string, prefix string",
    )
    urls = list({f"http://h.com{p}" for p in paths})
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: (r.matched_prefix, r.allowed)
           for r in robots_filter(urls_df, rules_df).collect()}
    for u in urls:
        path = u[len("http://h.com"):]
        assert got[u] == ref_robots_verdict(rules, path), (u, rules)


# -- chunk dedup -------------------------------------------------------

doc_st = st.lists(
    st.lists(st.sampled_from(["x", "y"]), min_size=1, max_size=10).map(" ".join),
    min_size=1,
    max_size=6,
)


def ref_chunk_dedup(texts, k=3):
    seen, out = set(), {}
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        chunks = [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]
        kept = []
        for c in chunks:  # within-doc repeats also dedup (global keep-first)
            if c not in seen:
                kept.append(c)
                seen.add(c)
        out[doc_id] = (len(chunks), len(kept), " ".join(kept))
    return out


@settings(**SETTINGS)
@given(doc_st)
def test_chunk_dedup_matches_reference(spark, texts):
    from readability_spark.operators.decontam import chunk_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.text_dedup)
           for r in chunk_dedup(df, chunk_tokens=3).collect()}
    assert got == ref_chunk_dedup(texts), texts


# -- blocklist suffix matching -----------------------------------------

host_st = st.lists(
    st.sampled_from(["a", "b", "com", "org", "x"]), min_size=1, max_size=4
).map(".".join)


@settings(**SETTINGS)
@given(st.lists(host_st, min_size=1, max_size=6), st.lists(host_st, min_size=1, max_size=3))
def test_blocklist_suffix_matches_reference(spark, hosts, blocked):
    from readability_spark.operators.urltools import blocklist_filter

    urls = list({f"http://{h}/p" for h in hosts})
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    bl = spark.createDataFrame([(d,) for d in set(blocked)], "domain string")
    got = {r.url: r.keep for r in blocklist_filter(df, bl).collect()}
    for u in urls:
        h = u[len("http://"):-len("/p")]
        ref_blocked = any(h == d or h.endswith("." + d) for d in blocked)
        assert got[u] == (not ref_blocked), (u, blocked)


def test_zipf_slope_near_minus_one_on_zipfian_text(spark):
    """A synthetic corpus drawn with exact Zipfian token counts must fit a
    slope of ~-1; a uniform-frequency corpus must fit ~0 (flat spectrum)."""
    from pyspark.sql import Row
    from readability_spark.operators.textstats import zipf_slope

    # exact counts c_r = round(1000/r) for ranks 1..50 -> slope ~ -1
    zipf_words = " ".join(
        " ".join([f"w{r:02d}"] * round(1000 / r)) for r in range(1, 51)
    )
    flat_words = " ".join(" ".join([f"u{r:02d}"] * 20) for r in range(1, 51))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, source="zipf", text=zipf_words),
            Row(doc_id=1, source="flat", text=flat_words),
        ]
    )
    out = {r.grp: r for r in zipf_slope(docs).collect()}
    assert out["zipf"].n_types == 50
    assert -1.15 < out["zipf"].zipf_slope < -0.85
    assert out["flat"].zipf_slope == 0.0


def test_zipf_slope_single_type_group_has_no_slope(spark):
    from pyspark.sql import Row
    from readability_spark.operators.textstats import zipf_slope

    docs = spark.createDataFrame(
        [Row(doc_id=0, source="one", text="same same same")]
    )
    row = zipf_slope(docs).collect()[0]
    assert row.n_types == 1 and row.n_tokens == 3
    assert row.zipf_slope is None
