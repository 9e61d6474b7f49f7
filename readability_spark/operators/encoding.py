"""Encoding-damage (mojibake) detection and single-pass repair.

A standard webtext QA family the crawl-cleaning literature applies right
after extraction (ftfy is the canonical tool; C4/CCNet drop or fix pages
with decode residue): text that went through a wrong charset round-trip
carries tell-tale artifacts that are cheap to detect with pure regex
column expressions — no Python in the plan.

Signals, each an exact non-overlapping match count:

- **U+FFFD residue** — replacement characters left by a lossy decode.
- **raw C1 controls** (U+0080–U+009F) — windows-1252 bytes decoded as
  latin-1, or the unmapped-byte leftovers of the UTF-8-as-1252 case.
- **UTF-8-as-cp1252, 2-byte** — a lead in ``Â..ß`` (misdecoded UTF-8 lead
  bytes 0xC2–0xDF) followed by one cp1252 continuation char (``Ã©`` for
  ``é``, ``Â£`` for ``£``).
- **UTF-8-as-cp1252, 3-byte** — a lead in ``à..ï`` (0xE0–0xEF) followed by
  two continuation chars (``â€™`` for ``’``). Counted separately: the two
  alphabets are disjoint (leads U+00C0–U+00EF vs continuations, which are
  cp1252 images of 0x80–0xBF), so no match of one class can sit inside a
  match of the other and the two counts are order-independent.
- **UTF-8-as-cp1252, 4-byte** — a lead in ``ð..÷`` (0xF0–0xF7) followed by
  three continuation chars: misdecoded astral-plane text, overwhelmingly
  emoji on real pages (``ðŸ˜€`` for ``😀``). The lead alphabet is again
  disjoint from the 2/3-byte leads and from the continuation set, so all
  three moji counts are mutually order-independent.
- **double-escaped entities** — ``&amp;amp;``-style, HTML escaped twice.
- **numeric-entity residue** — ``&#8217;``-style markup that survived
  extraction into "plain" text.

``damage_total`` is the sum of the signal counts (signals can overlap on a
char — e.g. an unmapped continuation byte is both a C1 control and part of
a 2-byte artifact — it is a severity score, not a disjoint char count).
The only floating-point value is the per-kilochar rate, round4-quantized
like every other cross-engine double in this repo.

**Repair** is the ftfy-lite single pass: a fixed table of
(artifact → original) literal replacements generated from the WHATWG
windows-1252 mapping for the Latin-1 Supplement plus the common General
Punctuation / Latin Extended-A characters, applied longest-artifact-first
as a chain of ``replace`` calls. Both Spark's ``replace`` and the SQL
oracle's ``replace`` substitute all non-overlapping occurrences
left-to-right, so the chain is deterministic cross-engine. Single pass by
design: doubly-mojibaked text repairs one layer per application.

Scale shape: both operators are one codegen projection — regex counts or
a literal-replace chain — with no shuffle, no Python, and no state;
embarrassingly parallel at any corpus size. The detection regexes are
shared verbatim with the DuckDB oracle (module constants), as is the
repair table.

Reference parity note: the reference repo (vborovikov/readability) has no
encoding-repair stage — its Brackets parser assumes well-decoded input
(test fixtures are clean UTF-8, test/SampleTests.cs:174). This family is
part of the training-data-pipeline surface built on top of extraction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _whatwg_1252(b: int) -> str:
    """WHATWG windows-1252 decode of one byte: cp1252 where mapped, the
    same-valued C0/C1 control where not (the browser behavior, which is
    what produced real-world mojibake in the first place)."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


def mojibake(s: str) -> str:
    """Encode ``s`` as UTF-8 and mis-decode it as windows-1252 — the
    canonical damage generator, used by the synthetic injector and tests."""
    return "".join(_whatwg_1252(b) for b in s.encode("utf-8"))


def _cls(chars: str) -> str:
    """A regex character class of literal chars, valid in both Java regex
    (Spark) and RE2 (DuckDB): re.escape only touches ASCII specials and
    the sets below contain none that change meaning in either dialect."""
    return "[" + re.escape(chars) + "]"


_CONT = "".join(_whatwg_1252(b) for b in range(0x80, 0xC0))
_LEAD2 = "".join(chr(c) for c in range(0xC2, 0xE0))  # Â..ß
_LEAD3 = "".join(chr(c) for c in range(0xE0, 0xF0))  # à..ï
_LEAD4 = "".join(chr(c) for c in range(0xF0, 0xF8))  # ð..÷

#: Detection patterns — module constants so the oracle embeds the SAME
#: strings (the cross-engine contract is pattern identity, not parallel
#: construction).
PAT_FFFD = "�"
PAT_C1 = _cls("".join(chr(c) for c in range(0x80, 0xA0)))
PAT_MOJI2 = _cls(_LEAD2) + _cls(_CONT)
PAT_MOJI3 = _cls(_LEAD3) + _cls(_CONT) + _cls(_CONT)
PAT_MOJI4 = _cls(_LEAD4) + _cls(_CONT) + _cls(_CONT) + _cls(_CONT)
PAT_DBL_ENTITY = "&amp;(amp|lt|gt|quot|nbsp|#[0-9]+);"
PAT_ENTITY_RESIDUE = "&#[0-9]{2,6};"

#: Characters the single-pass repair recovers: General Punctuation +
#: Latin Extended-A / letterlike commonly seen in web text (3-byte UTF-8
#: → 3-char artifacts) and the full printable Latin-1 Supplement (2-byte
#: → 2-char artifacts). NBSP included: ``Â `` is the single most common
#: artifact on real pages.
_REPAIR_CHARS = (
    "‘’“”–—…•‹›"
    "‚„†‡‰™€"
    "ŒœŠšŽžŸƒˆ˜"
    + "".join(chr(c) for c in range(0xA0, 0x100))
    # curated astral set: the emoji/symbol code points that dominate
    # real-page 4-byte damage (4-char artifacts, ``ðŸ˜€`` → ``😀``),
    # plus BMP ❤ (a 3-byte artifact, but it travels with the emoji set)
    + "😭🙂🙏👍👎🎉🔥💯❤"
    + "".join(chr(c) for c in range(0x1F600, 0x1F610))
)

#: (artifact, original) pairs, longest artifact first (3-char artifacts
#: contain no 2-char artifact as a substring — leads and continuations are
#: disjoint alphabets — but length-ordering makes the chain robust to
#: table edits). Deterministic tiebreak on the artifact string itself.
REPAIR_TABLE: tuple = tuple(
    sorted(
        {mojibake(c): c for c in _REPAIR_CHARS}.items(),
        key=lambda p: (-len(p[0]), p[0]),
    )
)

#: Synthetic damage injected by :func:`with_synthetic_mojibake`, keyed on
#: ``doc_id % (len(INJECTIONS) + 1)`` (last class = clean control group).
#: Every class of signal is represented so the detector columns are all
#: non-trivially exercised.
INJECTIONS: tuple = (
    mojibake("cliché déjà vu"),
    mojibake("don’t “quote” – dash — here…"),
    "&amp;amp; fish &amp;#8217; chips &#160;",
    "broken ��� decode",
    mojibake("priced £5 and © naïve"),
    "ctrl\x85line\x92quote",
    mojibake("emoji 😀 and 🎉 here"),
)


def with_synthetic_mojibake(docs: DataFrame) -> DataFrame:
    """Append a deterministic damage string to ``text`` keyed on
    ``doc_id % (len(INJECTIONS) + 1)`` (one class per injection + one
    clean residue class), so the detector and repairer have known
    non-trivial work on the synthetic corpus. Mirrored literally by the
    SQL oracle."""
    sel = F.col("doc_id") % (len(INJECTIONS) + 1)
    out: Column = F.col("text")
    for i, inj in enumerate(INJECTIONS):
        out = F.when(sel == i, F.concat(F.col("text"), F.lit(" " + inj))).otherwise(
            out
        )
    return docs.select("doc_id", out.alias("text"))


def _count(pat: str) -> Column:
    return F.regexp_count(F.col("text"), F.lit(pat)).cast("bigint")


def encoding_damage(docs: DataFrame) -> DataFrame:
    """Per-document encoding-damage signals over ``(doc_id, text)``.

    Output: ``doc_id, n_chars, n_fffd, n_c1, n_moji2, n_moji3, n_moji4,
    n_dbl_entity, n_entity_residue, damage_total, damage_per_kchar,
    is_damaged``. All counts are exact integers; the rate is the sole
    double, round4-quantized. Zero shuffles — one projection.
    """
    from readability_spark.operators.dedup import round4

    n_chars = F.length("text").cast("bigint")
    counts = {
        "n_fffd": _count(PAT_FFFD),
        "n_c1": _count(PAT_C1),
        "n_moji2": _count(PAT_MOJI2),
        "n_moji3": _count(PAT_MOJI3),
        "n_moji4": _count(PAT_MOJI4),
        "n_dbl_entity": _count(PAT_DBL_ENTITY),
        "n_entity_residue": _count(PAT_ENTITY_RESIDUE),
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    d = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        *[c.alias(k) for k, c in counts.items()],
        total.alias("damage_total"),
    )
    rate = F.when(
        F.col("n_chars") > 0,
        F.col("damage_total").cast("double")
        * 1000.0
        / F.col("n_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "*",
        round4(rate).alias("damage_per_kchar"),
        (F.col("damage_total") > 0).alias("is_damaged"),
    )


def mojibake_repair(docs: DataFrame) -> DataFrame:
    """Single-pass ftfy-lite repair over ``(doc_id, text)``: apply
    :data:`REPAIR_TABLE` as a chain of literal ``replace`` calls.

    Output: ``doc_id, changed, chars_removed, text_repaired`` —
    ``chars_removed`` is the exact character-length delta (each 2-char
    artifact recovers to 1 char, each 3-char to 1). One projection, no
    shuffle, no Python.
    """
    fixed: Column = F.col("text")
    for artifact, original in REPAIR_TABLE:
        fixed = F.replace(fixed, F.lit(artifact), F.lit(original))
    return docs.select(
        "doc_id",
        (F.col("text") != fixed).alias("changed"),
        (F.length("text") - F.length(fixed)).cast("bigint").alias("chars_removed"),
        fixed.alias("text_repaired"),
    )
