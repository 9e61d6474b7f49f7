"""PII detection + redaction for training-data pipelines.

A web-scale training corpus must scrub personally identifiable information
before the text reaches a model. These operators redact the three
highest-volume machine-matchable PII classes (emails, NANP-style phone
numbers, IPv4 addresses) with pure JVM `regexp_replace` / `regexp_count`
column expressions — whole-stage codegen, no Python in the loop, linear at
any scale. The regexes stay inside the syntax subset Java regex and DuckDB
RE2 share (character classes, bounded repetition, ``\\b``), so the operator
has an exact SQL oracle like the rest of the pipeline surface.

Reference scope note: the reference library is a single-document extractor
with no corpus-level PII pass; this belongs to the training-data pipeline
surface (brief: text-analysis/quality family), same tier as textstats.

Redaction order is part of the contract (email, then IPv4, then phone):
counts are taken on the raw text first, so overlapping matches can never be
double-redacted or double-counted differently between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared Java-regex / RE2 subset. `-` sits last in classes; no lookarounds.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def with_injected_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically append synthetic PII to the corpus text so scrub
    queries have a known non-empty answer (the sf tables are PII-free).

    doc_id % 3 == 0 → an email; == 1 → a phone number; == 2 → an IPv4.
    """
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@mail.example.com for details")
    )
    phone = F.concat(
        F.lit(" call 202-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    ip = F.concat(
        F.lit(" server 10."),
        (did % 256).cast("string"),
        F.lit("."),
        ((did * 7) % 256).cast("string"),
        F.lit("."),
        (did % 100 + 1).cast("string"),
        F.lit(" logged"),
    )
    tail = (
        F.when(did % 3 == 0, email).when(did % 3 == 1, phone).otherwise(ip)
    )
    return docs.withColumn(text_col, F.concat(F.col(text_col), tail))


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact emails / phones / IPv4s: (doc_id, n_emails,
    n_phones, n_ips, clean_text). Counts are measured on the raw text;
    redaction replaces each class with a typed placeholder token."""
    raw = F.col(text_col)
    clean = F.regexp_replace(raw, EMAIL_RE, EMAIL_TOKEN)
    clean = F.regexp_replace(clean, IPV4_RE, IPV4_TOKEN)
    clean = F.regexp_replace(clean, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(raw, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(raw, F.lit(IPV4_RE)).cast("int").alias("n_ips"),
        clean.alias("clean_text"),
    )


def pii_density_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source PII density — the governance report a release review
    reads before shipping a corpus: which sources leak contact data, at
    what rate, and how much of their page mass is affected. Counts come
    from the same regex family :func:`pii_scrub` redacts with, so the
    report and the scrubber can never disagree about what counts as PII.

    Scale shape: the regex counts are pure codegen projections; the
    report is one map-side-combined groupBy(source) over five longs —
    the document text never enters the shuffle.

    Output: (source, n_docs, n_docs_with_pii, n_emails, n_phones, n_ips,
    hits_per_1k_tokens).
    """
    from readability_spark.operators.dedup import round4

    raw = F.col(text_col)
    j = docs.select(
        "doc_id",
        "source",
        F.size(F.split(raw, " ")).cast("long").alias("n_toks"),
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(raw, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
    )
    hits = F.col("n_emails") + F.col("n_phones") + F.col("n_ips")
    per = j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((hits > 0).cast("int")).cast("bigint").alias("n_docs_with_pii"),
        F.sum("n_emails").cast("bigint").alias("n_emails"),
        F.sum("n_phones").cast("bigint").alias("n_phones"),
        F.sum("n_ips").cast("bigint").alias("n_ips"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )
    total = F.col("n_emails") + F.col("n_phones") + F.col("n_ips")
    return per.select(
        "source",
        "n_docs",
        "n_docs_with_pii",
        "n_emails",
        "n_phones",
        "n_ips",
        round4(total * F.lit(1000.0) / F.col("n_tokens")).alias("hits_per_1k_tokens"),
    )


# 13-16 digit runs with word boundaries — the Java-regex / RE2 shared
# subset; runs longer than 16 digits match in NEITHER engine (no \b inside
# a digit run), so both sides see the identical candidate list.
CC_RE = r"\b\d{13,16}\b"
#: Multiplier spreading doc_id into a deterministic 15-digit base (Knuth).
CC_BASE_MULT = 2654435761


def _luhn_fold(x):
    return F.when(x > 9, x - 9).otherwise(x)


def luhn_sum(s_col, parity: int):
    """Luhn checksum of a digit-string column: right position p (1-based
    from the right end) is doubled (and digit-folded) iff p % 2 == parity.
    parity=0 validates a full number (check digit at p=1 not doubled);
    parity=1 computes the sum of a 15-digit base whose digits shift one
    position left once the check digit is appended. Pure integer column
    expressions — exact on both engines."""
    n = F.length(s_col)

    def term(p):
        d = s_col.substr(n - p + 1, F.lit(1)).cast("int")
        return F.when((p % 2) == parity, _luhn_fold(d * 2)).otherwise(d)

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), n), term), F.lit(0), lambda a, x: a + x
    )


def with_injected_cc(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically append a 16-digit card-shaped number: doc_id % 7
    == 2 gets a Luhn-VALID number (check digit computed from the 15-digit
    base), % 7 == 5 the SAME base with the check digit off by one
    (invalid — the half the validator must reject), others unchanged."""
    did = F.col("doc_id")
    base15 = F.lpad(((did * CC_BASE_MULT) % (10**15)).cast("string"), 15, "0")
    check = (10 - (luhn_sum(base15, parity=1) % 10)) % 10
    tail = F.concat(F.lit(" card "), base15, F.lit(""))
    valid_cc = F.concat(tail, check.cast("string"), F.lit(" on file"))
    invalid_cc = F.concat(tail, ((check + 1) % 10).cast("string"), F.lit(" on file"))
    new_text = (
        F.when(did % 7 == 2, F.concat(F.col(text_col), valid_cc))
        .when(did % 7 == 5, F.concat(F.col(text_col), invalid_cc))
        .otherwise(F.col(text_col))
    )
    return docs.withColumn(text_col, new_text)


def cc_luhn_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Luhn-validated credit-card detection: extract 13-16 digit runs,
    validate each with the exact integer Luhn checksum, and report
    ``doc_id, n_candidates, n_valid, has_valid_cc`` per document. The
    regex alone is not a PII signal (order ids, timestamps); the checksum
    is what separates card-shaped noise from redaction-worthy hits.

    Scale shape: zero shuffles — one codegen projection (regexp extract +
    higher-order integer fold per candidate), same contract as pii_scrub.
    """
    cands = F.regexp_extract_all(F.col(text_col), F.lit(CC_RE), F.lit(0))
    valid = F.filter(cands, lambda s: (luhn_sum(s, parity=0) % 10) == 0)
    return docs.select(
        "doc_id",
        F.size(cands).cast("int").alias("n_candidates"),
        F.size(valid).cast("int").alias("n_valid"),
        (F.size(valid) > 0).alias("has_valid_cc"),
    )


def rare_ngram_report(docs: DataFrame, rare_df: int = 1) -> DataFrame:
    """Memorization-risk audit: per-document density of corpus-unique
    n-grams.

    A document whose 3-grams appear nowhere else in the corpus is the kind
    of document a model can only emit by memorizing it (Carlini et al.'s
    extraction work keys on exactly this duplication/uniqueness axis);
    documents that share all their n-grams are safe-to-memorize
    boilerplate. Output per doc: total distinct 3-grams, how many have
    corpus document-frequency ≤ ``rare_df``, and the rare fraction —
    the triage signal for privacy review / dedup-before-train decisions.

    Scale shape: the same postings discipline as the n-gram dedup family
    (dedup._ngram_pair_common): shingle explode → map-side-combined DF
    count → the join back is FILTERED TO RARE KEYS FIRST, so every join
    key has ≤ ``rare_df`` postings by construction — skew-free without a
    cap, shuffles carry short strings and longs only.
    """
    from readability_spark.operators.dedup import _shingles

    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).localCheckpoint(
        eager=False
    )
    exploded = sh.select("doc_id", F.explode("sh").alias("g"))
    rare_keys = (
        exploded.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= rare_df)
        .select("g")
    )
    rare_counts = (
        exploded.join(rare_keys, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_rare"))
    )
    sizes = sh.select("doc_id", F.size("sh").cast("bigint").alias("n_ngrams"))
    out = sizes.join(rare_counts, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce(F.col("n_rare"), F.lit(0)).cast("bigint").alias("n_rare"),
        (
            F.floor(
                F.coalesce(F.col("n_rare"), F.lit(0))
                / F.col("n_ngrams")
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("rare_frac"),
    )
    return out
