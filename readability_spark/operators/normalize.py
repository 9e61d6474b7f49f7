"""Unicode text normalization — the ingestion-time canonicalization pass
every web-text pipeline runs before hashing, dedup, or tokenization
(CCNet, C4, and RefinedWeb all normalize before their dedup hashes so
that byte-different-but-canonically-equal strings collide).

Steps, in order (both the Spark plan and the DuckDB oracle apply them in
exactly this order):

1. NBSP (U+00A0) -> ASCII space — the one non-ASCII whitespace HTML emits
   constantly; handled explicitly because neither Java's nor RE2's default
   ``\\s`` matches it;
2. strip C0 control characters except TAB/LF/CR (and DEL);
3. collapse ASCII whitespace runs to a single space;
4. trim;
5. Unicode NFC composition.

Only step 5 needs Python (Spark has no NFC builtin): a vectorized
Arrow-batched ``pandas_udf`` over ``Series.str.normalize`` — the 1-4
prefix stays whole-stage-codegen, and the plan has **zero shuffles**
(pure projection, embarrassingly parallel at any scale).

The driver's synthetic corpus is pure ASCII (NFC-invariant), so
:func:`with_messy_text` deterministically injects the classic NFC cases —
combining acute (e+U+0301 -> e-acute), ANGSTROM SIGN (U+212B -> U+00C5),
OHM SIGN (U+2126 -> U+03A9), A+combining ring (-> U+00C5) — plus NBSP,
BEL, and double-space noise, keyed on ``doc_id`` arithmetic so the DuckDB
oracle rebuilds the identical bytes. All injected codepoints have been
canonically stable since Unicode 1.1, so Python's unicodedata and DuckDB's
utf8proc agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: C0 controls except TAB(09)/LF(0A)/CR(0D), plus DEL(7F).
_CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

_NBSP = "\u00a0"
_BEL = "\u0007"


@pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def with_messy_text(docs: DataFrame) -> DataFrame:
    """Deterministically dirty the ASCII synthetic corpus: per-doc unicode
    suffix cycling on ``doc_id % 4``, a BEL control when ``doc_id % 3 == 0``,
    an NBSP+double-space run when ``doc_id % 2 == 0``."""
    d = F.col("doc_id")
    suffixes = F.array(
        F.lit(" café"),  # e + COMBINING ACUTE -> cafe'
        F.lit(" Ångström"),  # ANGSTROM SIGN; o + COMBINING DIAERESIS
        F.lit(" Ωhm"),  # OHM SIGN -> GREEK CAPITAL OMEGA
        F.lit(" Å"),  # A + COMBINING RING ABOVE -> U+00C5
    )
    bel = F.when(d % 3 == 0, F.lit(_BEL)).otherwise(F.lit(""))
    gap = F.when(d % 2 == 0, F.lit(" " + _NBSP + " ")).otherwise(F.lit(" "))
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"), bel, gap, F.element_at(suffixes, (d % 4 + 1).cast("int"))
        ),
    )


def _canon_prefix(text: Column) -> Column:
    s = F.replace(text, F.lit(_NBSP), F.lit(" "))
    s = F.regexp_replace(s, _CTRL_CLASS, "")
    s = F.regexp_replace(s, "\\s+", " ")
    return F.trim(s)


def normalize_text(docs: DataFrame) -> DataFrame:
    """Normalize ``(doc_id, text)``: returns ``doc_id, text_norm,
    n_chars_raw, n_chars_norm, changed``."""
    raw = F.col("text")
    norm = _nfc(_canon_prefix(raw))
    return docs.select(
        "doc_id",
        norm.alias("text_norm"),
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != raw).alias("changed"),
    )
