"""C4-style line- and page-level cleaning (Raffel et al. 2020, §2.2).

The cleaning pass that produced C4 from Common Crawl — the other canonical
web-corpus rule set next to the Gopher/MassiveWeb document filters already
in ``operators/textstats.py``. Works over ``\\n``-lined, whitespace-normalized
``text``. Rules, matching the published pipeline:

- **Line level** (a line survives only if ALL hold):
  - ends in a terminal punctuation mark (``.`` ``!`` ``?`` or a closing
    double quote) — boilerplate menus/footers rarely do;
  - has at least ``min_line_words`` words (paper: 5);
  - does not contain the word ``javascript`` (case-insensitive substring,
    as in the released implementation) — kills "enable JavaScript" banners.
- **Page level** (the page is dropped, ``text_clean = ''``, if ANY hold):
  - fewer than ``min_lines`` retained lines (the paper drops pages with
    fewer than 3 sentences; retained-line count is the lined-text proxy);
  - contains any blocklist word (paper: the LDNOOBW list; here a
    parameter — word-boundary regex search like the original);
  - contains the phrase ``lorem ipsum`` (template placeholder pages);
  - contains a curly brace (code, not prose).

C4's remaining step — global dedup of repeated three-sentence spans — is
span-level global dedup, covered by :func:`~readability_spark.operators.
decontam.chunk_dedup` (same keep-first election, token-window spans); its
``langdetect`` English gate composes from :func:`~readability_spark.
operators.textstats.lang_id`.

Scale shape: one codegen projection — split, array filter, regexes, rejoin.
No shuffle, no Python, embarrassingly parallel at any corpus size; the
blocklist rides inside the plan as a compiled regex alternation (the real
LDNOOBW list is a few hundred words — still a literal; a million-entry
blocklist would switch to the broadcast suffix-join in
``operators/urltools.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Placeholder demo blocklist — the real deployment passes the LDNOOBW
#: ("List of Dirty, Naughty, Obscene or Otherwise Bad Words") list.
C4_DEMO_BADWORDS = ("xxbadwordxx",)


def _keep_line(min_line_words: int) -> callable:
    def keep(l: Column) -> Column:
        return (
            l.rlike('[.!?"]$')
            & (F.size(F.split(l, " ")) >= min_line_words)
            & ~F.lower(l).contains("javascript")
        )

    return keep


def c4_clean(
    docs: DataFrame,
    min_line_words: int = 5,
    min_lines: int = 3,
    badwords: tuple = C4_DEMO_BADWORDS,
) -> DataFrame:
    """Apply the C4 cleaning rules to a ``(doc_id, text)`` frame whose
    ``text`` carries ``\\n`` line breaks.

    Returns one row per input doc: ``doc_id, n_lines, n_kept, has_badword,
    has_lorem, has_brace, c4_pass, text_clean`` — ``text_clean`` is the
    surviving lines rejoined with ``\\n`` when the page passes, else ``''``
    (every doc is kept as a row so the drop *reasons* stay auditable;
    filtering to survivors is one ``WHERE c4_pass``).
    """
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(lines, _keep_line(min_line_words))
    low = F.lower(F.col("text"))
    # Real LDNOOBW entries contain regex metacharacters (punctuation); escape
    # each word so the alternation matches literally. re.escape output is
    # valid in both Java regex (Spark) and RE2 (DuckDB oracle side).
    import re as _re

    bad_re = (
        "(^|[^a-z0-9])("
        + "|".join(_re.escape(w) for w in badwords)
        + ")($|[^a-z0-9])"
    )
    has_badword = low.rlike(bad_re)
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    page_ok = (
        (F.size(kept) >= min_lines) & ~has_badword & ~has_lorem & ~has_brace
    )
    return docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        has_badword.alias("has_badword"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        page_ok.alias("c4_pass"),
        F.when(page_ok, F.concat_ws("\n", kept)).otherwise("").alias("text_clean"),
    )


def line_dedup(
    docs: DataFrame, min_docs: int = 4, broadcast_banned: bool = True
) -> DataFrame:
    """Corpus-frequency boilerplate-line removal (RefinedWeb §"exact line
    deduplication", Penedo et al. 2023; CCNet's paragraph-hash dedup, Wenzek
    et al. 2020): a line that occurs in ``min_docs`` or more *distinct*
    documents is boilerplate (cookie banners, nav menus, share widgets) and
    is dropped from EVERY document — including the first occurrence, which
    is what distinguishes this from :func:`~readability_spark.operators.
    decontam.chunk_dedup`'s keep-first election (there the first copy is
    content; here no copy is).

    Works over ``\\n``-lined ``(doc_id, text)``. Returns one row per input
    doc: ``doc_id, n_lines, n_kept, text_clean`` (``text_clean`` rejoins the
    surviving lines in original order; empty when every line was banned).

    Scale shape at 100 TB: document frequency is two map-side-combined
    aggregations over ``(md5(line), doc_id)`` — the per-(line, doc) distinct
    pass collapses within-doc repeats before the count, so a line repeated
    on every page never funnels one task (same pattern as chunk_dedup's
    keeper election). The banned set is the boilerplate *vocabulary* —
    orders of magnitude smaller than the corpus — so the removal join is a
    **broadcast anti-join**: document lines never shuffle for it. Set
    ``broadcast_banned=False`` if a pathological threshold makes the banned
    set exceed broadcast size; the anti-join then shuffles on the line hash.
    Reassembly groups by doc_id with fan-in bounded by lines-per-doc.
    """
    lines = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line")
    ).withColumn("h", F.md5("line"))
    banned = (
        lines.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("h")
    )
    if broadcast_banned:
        banned = F.broadcast(banned)
    kept = lines.join(banned, "h", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
    )
    n_lines = F.size(F.split(F.col("text"), "\n"))
    return (
        docs.select("doc_id", n_lines.cast("bigint").alias("n_lines"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def with_synthetic_lines(docs: DataFrame, width: int = 8) -> DataFrame:
    """Deterministically re-line the single-line synthetic corpus so every
    C4 rule branch has work to do (the driver's ``documents.text`` is one
    whitespace-normalized line — no line structure survives extraction).

    Lines are consecutive ``width``-token chunks; line ``i`` of doc ``d``
    gets terminal punctuation cycling ``['.', '!', '?', ''][(d+i) % 4]``
    (the ``''`` case exercises the terminal-punct drop) and a leading
    ``javascript `` word when ``(d+i) % 7 == 0``. Page-level injections:
    ``lorem ipsum`` line when ``d % 11 == 0``, a curly-brace line when
    ``d % 13 == 0``, a blocklist word when ``d % 17 == 0``. Purely
    arithmetic on (doc_id, token index) → exactly reproducible in any
    engine; the DuckDB oracle builds the identical strings.
    """
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / width).cast("int")
    punct = F.array(F.lit("."), F.lit("!"), F.lit("?"), F.lit(""))
    d = F.col("doc_id")

    def line(i: Column) -> Column:
        return F.concat(
            F.when((d + i) % 7 == 0, F.lit("javascript ")).otherwise(""),
            F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
            F.get(punct, ((d + i) % 4).cast("int")),
        )

    base = F.transform(F.sequence(F.lit(0), n_lines - 1), line)
    extras = F.filter(
        F.array(
            F.when(d % 11 == 0, F.lit("lorem ipsum dolor sit amet.")),
            F.when(d % 13 == 0, F.lit("config block { not prose } here.")),
            F.when(d % 17 == 0, F.lit("xxbadwordxx spam spam spam spam.")),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.withColumn("text", F.concat_ws("\n", F.concat(base, extras)))


def host_boilerplate_lines(
    docs: DataFrame, min_docs: int = 3, group_col: str = "source"
) -> DataFrame:
    """Per-host boilerplate template mining — the site-local counterpart
    of :func:`line_dedup`'s corpus-global pass (trafilatura/CCNet strip
    per-SITE templates: nav menus and footers repeat within a host long
    before they repeat across the corpus): a line occurring in
    ``min_docs`` or more distinct documents OF THE SAME group is a
    template candidate.

    Scale shape: one distinct over (group, doc_id, line-hash) — collapses
    within-doc repeats map-side — then a map-side-combined count per
    (group, line). No line list funnels through one task; the output is
    the per-host template vocabulary, tiny next to the corpus.

    Output: (grp, line, n_docs).
    """
    lines = docs.select(
        F.col(group_col).alias("grp"),
        "doc_id",
        F.explode(F.split(F.col("text"), "\n")).alias("line"),
    ).distinct()
    return (
        lines.groupBy("grp", "line")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def dedup_doc_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repeated-line removal: within EACH document keep only
    the first occurrence of every line (pagination artifacts, repeated nav
    blocks, chat-log echoes). The within-doc complement of
    :func:`line_dedup` — there a corpus-frequent line loses every copy
    including the first; here the first copy is content and only the
    repeats go.

    Zero-shuffle by construction: the whole pass is higher-order array
    expressions (``split`` → indexed ``filter`` with an
    ``array_position``-over-prefix first-occurrence test → ``concat_ws``)
    evaluated row-local in codegen — no explode, no groupBy, no Python.
    The prefix scan is O(lines²) per document, which at web-document line
    counts (10-10³) is noise next to one shuffle of 10^12 rows; documents
    never leave their input partition, so filter pushdown and partition
    pruning above/below this operator are unaffected.

    Output: ``doc_id, n_lines, n_kept, text_clean``.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines, lambda x, i: F.array_position(F.slice(lines, F.lit(1), i), x) == 0
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.concat_ws("\n", kept).alias("text_clean"),
    )


# -- soft-404 / error-page detection -----------------------------------------

_SOFT404_TITLE = [
    ("not_found", r"(?i)\b(404|page not found|not found)\b"),
    ("gone", r"(?i)\b(410|page (?:has been )?removed|no longer available)\b"),
    ("denied", r"(?i)\b(403|access denied|forbidden)\b"),
    ("error", r"(?i)\b(500|server error|something went wrong)\b"),
]


def soft404_reason(title, text) -> "F.Column":
    """First matching error-page signal over the title (primary) and a
    short-body corroboration over the text: 'not_found' / 'gone' /
    'denied' / 'error' / 'thin' (sub-40-char body with an error word) /
    null for a healthy page. Soft 404s — error pages served with HTTP
    200 — are pure noise in a training corpus and poison dedup stats
    (thousands of identical 'not found' bodies per host)."""
    t = F.col(title) if isinstance(title, str) else title
    b = F.col(text) if isinstance(text, str) else text
    expr = None
    for reason, rx in _SOFT404_TITLE:
        cond = t.rlike(rx)
        expr = F.when(cond, F.lit(reason)) if expr is None else expr.when(cond, F.lit(reason))
    thin = (F.length(b) < 40) & b.rlike(r"(?i)\b(error|not found|unavailable)\b")
    return expr.when(thin, F.lit("thin"))


def soft404_report(
    pages: DataFrame, title_col: str = "title", text_col: str = "text"
) -> DataFrame:
    """(reason, n_pages) error-page routing matrix; healthy pages count
    under reason='ok'. Zero-shuffle detection + one map-side-combined
    exchange of one short string."""
    r = soft404_reason(F.col(title_col), F.col(text_col))
    return (
        pages.select(F.coalesce(r, F.lit("ok")).alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").cast("bigint").alias("n_pages"))
    )
