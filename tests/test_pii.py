"""PII scrub operator: detection counts, redaction, and engine parity of the
shared-regex-subset contract (the DuckDB oracle in __spark_entry__ reuses the
module's regex constants verbatim)."""

import re

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_scrub,
    with_injected_pii,
)

pytestmark = pytest.mark.spark


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_scrub_counts_and_redacts(spark):
    rows = pii_scrub(
        _df(
            spark,
            [
                "mail me at jane.doe+spam@sub.example.co.uk today",
                "call 415-555-2671 or 415-555-2672",
                "host 192.168.0.1 and 10.0.255.254 up",
                "no pii here at all",
                "mixed: bob@x.io from 8.8.8.8 dial 202-555-0199",
            ],
        )
    ).orderBy("doc_id").collect()
    assert [(r.n_emails, r.n_phones, r.n_ips) for r in rows] == [
        (1, 0, 0),
        (0, 2, 0),
        (0, 0, 2),
        (0, 0, 0),
        (1, 1, 1),
    ]
    assert rows[0].clean_text == "mail me at <EMAIL> today"
    assert rows[1].clean_text == "call <PHONE> or <PHONE>"
    assert rows[2].clean_text == "host <IP> and <IP> up"
    assert rows[3].clean_text == "no pii here at all"
    assert rows[4].clean_text == "mixed: <EMAIL> from <IP> dial <PHONE>"


def test_injection_always_scrubbable(spark):
    """Every injected PII string must be found (and removed) by its scrubber
    — the invariant the CORRECTNESS query relies on."""
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.lit("plain body text").alias("text")
    )
    out = pii_scrub(with_injected_pii(docs))
    hits = out.select(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).alias("n")
    )
    assert hits.filter(F.col("n") != 1).count() == 0
    # nothing PII-shaped survives in clean_text
    leftover = out.filter(
        F.col("clean_text").rlike(EMAIL_RE)
        | F.col("clean_text").rlike(PHONE_RE)
        | F.col("clean_text").rlike(IPV4_RE)
    )
    assert leftover.count() == 0


def test_regexes_stay_in_shared_subset():
    """The oracle contract: each pattern must compile under Python's re AND
    avoid Java/RE2-divergent syntax (lookarounds, backrefs, inline flags)."""
    for pat in (EMAIL_RE, PHONE_RE, IPV4_RE):
        re.compile(pat)
        assert not re.search(r"\(\?|\\[0-9]", pat), pat


def test_pii_density_report_consistent_with_scrub_counts(spark):
    import math

    from pyspark.sql import functions as F

    from readability_spark.operators.pii import (
        pii_density_report,
        pii_scrub,
        with_injected_pii,
    )

    docs = with_injected_pii(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    per_doc = {r.doc_id: r for r in pii_scrub(docs).collect()}
    meta = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("w")
    ).collect()
    agg: dict = {}
    for m in meta:
        d = agg.setdefault(m.source, [0, 0, 0, 0, 0, 0])
        c = per_doc[m.doc_id]
        d[0] += 1
        d[1] += 1 if (c.n_emails + c.n_phones + c.n_ips) > 0 else 0
        d[2] += c.n_emails
        d[3] += c.n_phones
        d[4] += c.n_ips
        d[5] += m.w
    rows = {r.source: r for r in pii_density_report(docs).collect()}
    assert set(rows) == set(agg)
    for src, (nd, npii, ne, nph, nip, nt) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_docs_with_pii, r.n_emails, r.n_phones, r.n_ips) == (
            nd, npii, ne, nph, nip,
        )
        assert r.hits_per_1k_tokens == math.floor(
            (ne + nph + nip) * 1000.0 / nt * 10000.0 + 0.5
        ) / 10000.0
        # every doc carries exactly one injected PII item by construction
        assert r.n_docs_with_pii == r.n_docs


def test_cc_luhn_validation_pure_python_parity(spark):
    """The Spark Luhn fold must agree with a naive per-digit reference on
    the injected corpus: % 7 == 2 docs carry exactly one valid card,
    % 7 == 5 docs a checksum-broken one, and the plan has no shuffle."""
    from readability_spark.operators.pii import cc_luhn_flags, with_injected_cc

    def luhn_ok(s):
        total = 0
        for p, ch in enumerate(reversed(s), 1):
            d = int(ch)
            total += (d * 2 - 9 if d * 2 > 9 else d * 2) if p % 2 == 0 else d
        return total % 10 == 0

    assert luhn_ok("4111111111111111") and not luhn_ok("4111111111111112")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    out = cc_luhn_flags(with_injected_cc(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for r in out.collect():
        if r.doc_id % 7 == 2:
            assert r.n_candidates >= 1 and r.n_valid >= 1 and r.has_valid_cc
        elif r.doc_id % 7 == 5:
            assert r.n_candidates >= 1 and r.n_valid == 0 and not r.has_valid_cc
    # spot-check the injected digits against the naive reference
    from readability_spark.operators.pii import CC_BASE_MULT

    for d in (2, 9, 16, 23):
        base = str((d * CC_BASE_MULT) % 10**15).zfill(15)
        cands = [base + str(c) for c in range(10) if luhn_ok(base + str(c))]
        assert len(cands) == 1  # exactly one valid check digit exists


def test_rare_ngram_report_duplicates_have_no_rare_ngrams(spark):
    from readability_spark.operators.pii import rare_ngram_report

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # exact copy of 1
            (3, "one two three four five six seven"),     # unique
            (4, "tiny"),                                   # single shingle, unique
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_ngrams, r.n_rare, r.rare_frac) for r in rare_ngram_report(docs).collect()}
    assert got[1][1] == 0 and got[2][1] == 0          # copies share every 3-gram
    assert got[3] == (5, 5, 1.0)                       # 7 tokens → 5 shingles, all unique
    assert got[4] == (1, 1, 1.0)
    assert got[1][0] == 4                              # 6 tokens → 4 shingles
