"""URL canonicalization + domain analytics for crawl pipelines.

A crawl feed reaches the same page through tracking-parameter variants,
fragments, and default ports; deduplicating on the RAW url string misses
all of them. These operators are pure JVM column expressions (regexes kept
in the syntax subset Java regex and DuckDB RE2 share, so every step has an
exact SQL oracle) — no Python in the loop, linear scale.

Reference scope note: the reference library operates on single documents
and has no pipeline-level url dedup; this is part of the training-data
pipeline surface (brief: dedup family). Its per-document url resolution
(DocumentUrl.cs) lives in core/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = "(utm_[a-z]+|fbclid|gclid|mc_cid|mc_eid|ref_src)"


def canonical_url(col) -> Column:
    """Normalize a url for identity comparison:

    1. strip the fragment;
    2. strip tracking query params (utm_*, fbclid, gclid, ...);
    3. collapse query separators left behind (``?&`` / ``&&`` / trailing);
    4. strip default ports (:80 for http, :443 for https);
    5. lowercase scheme and host (path/query stay case-sensitive).
    """
    u = F.regexp_replace(col, r"#.*$", "")
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAMS + r"=[^&]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # lowercase scheme+host BEFORE port stripping so HTTP://H:80 normalizes
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/?#]*", "")
    u = F.when(scheme_host != "", F.concat(scheme_host, rest)).otherwise(u)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(/|\?|$)", r"$1$2")
    return u


def host_of(col) -> Column:
    """Registrable host portion (no userinfo/port handling beyond split)."""
    return F.lower(F.regexp_extract(col, r"^[a-zA-Z]+://([^/:?#]+)", 1))


def canonical_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Groups of urls identical after canonicalization:
    (canonical_url, n_variants, keep_url). One shuffle, map-side combine."""
    return (
        pages.select(canonical_url(F.col(url_col)).alias("canonical_url"), url_col)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min(url_col).alias("keep_url"),
        )
    )


def path_of(col) -> Column:
    """Path portion of the url ('' when absent)."""
    return F.regexp_extract(col, r"^[a-zA-Z]+://[^/?#]+(/[^?#]*)", 1)


def blocklist_filter(
    pages: DataFrame,
    blocked_domains: DataFrame,
    blocked_path_regex: "str | None" = None,
    url_col: str = "url",
) -> DataFrame:
    """UT1-style crawl filtering: drop urls whose host falls under a blocked
    domain (suffix match — blocking ``example.com`` blocks ``a.b.example.com``)
    or whose path matches a keyword regex.

    ``blocked_domains`` is a one-column (``domain``) DataFrame. Real
    blocklists are ~10^6 domains vs 10^12 urls, so the match must be an
    equi-join on the small side: each host expands to its dot-suffix chain
    (bounded by label count, <= ~6 rows) and joins the broadcast blocklist on
    exact suffix — never a non-equi ``endswith`` scan. The path rule is one
    codegen regex. Output keeps every input url with ``reason``
    ('blocked_host' > 'blocked_path' > NULL) and ``keep``.
    """
    host = host_of(F.col(url_col))
    base = pages.select(F.col(url_col).alias("url"), host.alias("host"),
                        path_of(F.col(url_col)).alias("path"))
    labels = F.split(F.col("host"), r"\.")
    nlab = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), nlab),
        lambda i: F.concat_ws(".", F.slice(labels, i, nlab - i + 1)),
    )
    # Explode suffixes, mark via the broadcast (map-side) join, then fold
    # back to one row per url with a map-side-combined aggregation — never a
    # big-with-big rejoin, and the single shuffle carries <= 1 row per url
    # per input partition after partial aggregation.
    marked = base.select(
        "url", "host", "path", F.explode(suffixes).alias("suffix")
    ).join(
        F.broadcast(
            blocked_domains.select(
                F.col("domain").alias("suffix"), F.lit(1).alias("_hit")
            )
        ),
        "suffix",
        "left",
    )
    folded = marked.groupBy("url", "host", "path").agg(
        F.max("_hit").alias("_host_hit")
    )
    path_hit = (
        F.col("path").rlike(blocked_path_regex)
        if blocked_path_regex
        else F.lit(False)
    )
    return folded.select(
        "url",
        "host",
        F.when(F.col("_host_hit").isNotNull(), F.lit("blocked_host"))
        .when(path_hit, F.lit("blocked_path"))
        .alias("reason"),
        (F.col("_host_hit").isNull() & ~path_hit).alias("keep"),
    )


def domain_stats(pages: DataFrame, url_col: str = "url", chars_col: str = "n_chars") -> DataFrame:
    """Per-host corpus stats — the lineage/metrics rollup a crawl pipeline
    reports per domain (doc counts, total/mean content size)."""
    return (
        pages.select(host_of(F.col(url_col)).alias("host"), chars_col)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
        )
    )


def url_features(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-shape spam signals — the frontier-prioritization features every
    crawler scores before spending a fetch (long auto-generated hosts,
    digit-heavy subdomains, parameter farms, and deep calendar/session
    paths correlate with low-value pages; see the SEO-spam features in
    Ntoulas et al. 2006, "Detecting spam web pages through content
    analysis" — these are the URL-side analogues).

    Everything is regex/length arithmetic over the url string — pure
    codegen, zero shuffles, exactly mirrored in SQL. The composite
    ``suspicion`` in [0,1] is a fixed-weight blend: each component is
    already normalized, so the blend is engine-exact after round4.

    Output: (url, host, host_len, n_subdomains, host_digit_frac,
    host_hyphens, path_depth, path_len, n_params, pct_encoded, url_len,
    suspicion).
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z]+://([^/:?#]+)", 1))
    path = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+(/[^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    host_len = F.length(host)
    host_digits = host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))
    n_sub = F.length(host) - F.length(F.regexp_replace(host, r"\.", ""))
    hyphens = F.length(host) - F.length(F.regexp_replace(host, r"-", ""))
    depth = F.length(path) - F.length(F.regexp_replace(path, r"/", ""))
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, r"=", ""))
    )
    pct = F.floor(
        (F.length(u) - F.length(F.regexp_replace(u, r"%[0-9a-fA-F]{2}", ""))) / 3
    ).cast("int")
    digit_frac = F.when(host_len > 0, host_digits / host_len).otherwise(F.lit(0.0))
    suspicion = (
        0.25 * F.least(F.lit(1.0), digit_frac * 4)
        + 0.2 * F.least(F.lit(1.0), F.greatest(n_sub - 1, F.lit(0)) / 3.0)
        + 0.2 * F.least(F.lit(1.0), hyphens / 4.0)
        + 0.15 * F.least(F.lit(1.0), F.greatest(depth - 3, F.lit(0)) / 4.0)
        + 0.1 * F.least(F.lit(1.0), n_params / 4.0)
        + 0.1 * F.least(F.lit(1.0), F.length(u) / 160.0)
    )
    from readability_spark.operators.dedup import round4

    return pages.select(
        u.alias("url"),
        host.alias("host"),
        host_len.cast("int").alias("host_len"),
        n_sub.cast("int").alias("n_subdomains"),
        round4(digit_frac).alias("host_digit_frac"),
        hyphens.cast("int").alias("host_hyphens"),
        depth.cast("int").alias("path_depth"),
        F.length(path).cast("int").alias("path_len"),
        n_params.cast("int").alias("n_params"),
        pct.alias("pct_encoded"),
        F.length(u).cast("int").alias("url_len"),
        round4(suspicion).alias("suspicion"),
    )


def typosquat_candidates(
    pages: DataFrame,
    url_col: str = "url",
    top_k: int = 8,
    max_dist: int = 1,
) -> DataFrame:
    """Typosquatting / host-mirror governance: hosts within ``max_dist``
    edits of a high-traffic "brand" host.

    Brand list = the ``top_k`` hosts by page count (deterministic
    tie-break: host asc) — on a real crawl this is the Alexa-style head of
    the host distribution, a few thousand rows at most. Every OTHER host
    is screened against the brand list with ``levenshtein`` (a JVM builtin
    here, RE-free; same function in the DuckDB oracle), excluding the
    brand itself and its legitimate subdomains (``x.brand``).

    Scale shape: one groupBy(host) shuffle to build host counts, then a
    broadcast nested-loop join of hosts x top_k brands — linear in
    distinct hosts (NOT in pages), the brand side pinned tiny by
    contract. Spark >= 3.5 can push a levenshtein threshold down into the
    join filter; kept un-thresholded here for oracle parity.

    Output: (host, brand, dist, docs) — docs = pages on the suspect host.
    """
    host_counts = (
        pages.select(host_of(F.col(url_col)).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("docs"))
    )
    brands = (
        host_counts.orderBy(F.col("docs").desc(), F.col("host"))
        .limit(top_k)
        .select(F.col("host").alias("brand"))
    )
    dist = F.levenshtein(F.col("host"), F.col("brand"))
    return (
        host_counts.crossJoin(F.broadcast(brands))
        .filter(
            (dist <= max_dist)
            & (F.col("host") != F.col("brand"))
            & ~F.col("host").endswith(F.concat(F.lit("."), F.col("brand")))
        )
        .select("host", "brand", dist.cast("int").alias("dist"), "docs")
    )


def fold_host_variants(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Mobile/AMP/www host-variant folding: ``m.example.com/p1``,
    ``amp.example.com/p1``, ``www.example.com/p1`` and ``example.com/p1``
    are the same logical page served through different front-ends — a major
    near-dup source in Common-Crawl-shaped corpora that URL *string*
    canonicalization (:func:`canonical_url` — scheme/port/tracking-params)
    does not touch. Folds the ``www.`` / ``m.`` / ``amp.`` first label off
    the host, groups by (folded host, path), and elects one representative
    per group preferring the desktop origin: bare host < www < m < amp,
    then url ascending (a total order → byte-stable election).

    Output: ``canon_host, path, n_variants, n_urls, rep_url`` where
    ``n_variants`` counts distinct host spellings in the group.

    Scale shape at 100 TB: pure column expressions + ONE map-side-combined
    groupBy on the folded key; the variant-rank election rides the same
    aggregation as a ``min(struct)`` — no window, no second shuffle, no
    Python. Folded keys are at least as well-spread as raw hosts.
    """
    url = F.col(url_col)
    host = host_of(url)
    folded = F.regexp_replace(host, r"^(www|m|amp)\.", "")
    rank = (
        F.when(host == folded, 0)
        .when(host == F.concat(F.lit("www."), folded), 1)
        .when(host == F.concat(F.lit("m."), folded), 2)
        .otherwise(3)
    )
    return (
        pages.select(
            folded.alias("canon_host"),
            path_of(url).alias("path"),
            host.alias("host"),
            F.struct(rank.alias("r"), url.alias("u")).alias("cand"),
        )
        .groupBy("canon_host", "path")
        .agg(
            F.countDistinct("host").cast("bigint").alias("n_variants"),
            F.count("*").cast("bigint").alias("n_urls"),
            F.min("cand").getField("u").alias("rep_url"),
        )
    )


def crawl_trap_hosts(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 10,
    min_urls_per_content: float = 4.0,
) -> DataFrame:
    """Crawl-trap detection: hosts that mint an unbounded URL space over a
    tiny content set (calendar pagination, session-id path segments,
    faceted listing permutations — the classic frontier sinks). Per host,
    compare distinct URLs against distinct content fingerprints (md5 of
    text); a host serving ``min_urls``+ URLs at ``min_urls_per_content``+
    URLs per distinct content is flagged for frontier demotion.

    Scale shape at 100 TB: two map-side-combined distinct pre-aggregations
    — (host, url) and (host, fp) — each collapses within-partition repeats
    before shuffling, then two tiny per-host counts join on host. No
    multi-distinct expand, no host ever funnels its raw page list through
    one task, and the output is one row per host (~10^7).

    Output: (host, n_urls, n_contents, urls_per_content, is_trap).
    """
    base = pages.select(
        host_of(F.col(url_col)).alias("host"),
        F.col(url_col).alias("u"),
        F.md5(text_col).alias("fp"),
    )
    nu = (
        base.select("host", "u")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n_urls"))
    )
    nc = (
        base.select("host", "fp")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n_contents"))
    )
    ratio = F.col("n_urls").cast("double") / F.col("n_contents").cast("double")
    return nu.join(nc, "host").select(
        "host",
        "n_urls",
        "n_contents",
        (F.floor(ratio * 10000.0 + 0.5) / 10000.0).alias("urls_per_content"),
        (
            (F.col("n_urls") >= min_urls)
            & (ratio >= min_urls_per_content)
        ).alias("is_trap"),
    )


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: each source url's
    final landing url and exact hop count, with loop detection.

    Crawl reality: 3xx chains (http→https, host folds, tracking hops) mean
    the url you scheduled is rarely the url you stored; dedup and frontier
    accounting need the TERMINAL url per source, and redirect loops must be
    flagged, not followed forever. Input is the redirect map (one outgoing
    edge per source; later duplicates are dropped deterministically by
    min(dst)).

    Scale shape — the O(log H) trick, same family as dedup.py's
    cluster pointer-jumping: ``ceil(log2(max_hops))`` rounds, each ONE
    self-equi-join of the (node, nxt, dist) state on ``nxt == node`` plus
    ``localCheckpoint`` lineage truncation. A 10^9-row redirect map with
    hop depth ≤ 16 resolves in 4 shuffle rounds of long-key joins — never
    a per-hop sequential walk (max_hops joins) and never a driver loop.
    Rows whose pointer lands on a terminal node stop advancing (the join
    misses, dist freezes — exact hop counts, not 2^rounds overshoot);
    rows still pointing at a redirecting node after the rounds are loops
    (or chains past ``max_hops``) and come back ``looped=true``.

    Reference parity: crawl-frontier surface, SURVEY.md §2-extension
    (vborovikov/readability never fetches).
    """
    import math

    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nxt"))
        .groupBy("node")
        .agg(F.min("nxt").alias("nxt"))
        .persist()
    )
    heads = e.select(F.col("node").alias("t_node")).persist()

    state = e.select("node", "nxt", F.lit(1).cast("long").alias("dist"))
    state = state.localCheckpoint()
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        j = state.select(
            F.col("node").alias("j_node"),
            F.col("nxt").alias("j_nxt"),
            F.col("dist").alias("j_dist"),
        )
        state = (
            state.join(j, state["nxt"] == j["j_node"], "left")
            .select(
                "node",
                F.coalesce("j_nxt", "nxt").alias("nxt"),
                F.when(
                    F.col("j_nxt").isNotNull(), F.col("dist") + F.col("j_dist")
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
            )
            .localCheckpoint()
        )
    out = state.join(heads, state["nxt"] == heads["t_node"], "left").select(
        "node",
        F.when(F.col("t_node").isNull(), F.col("nxt")).alias("final"),
        F.when(F.col("t_node").isNull(), F.col("dist")).alias("hops"),
        F.col("t_node").isNotNull().alias("looped"),
    )
    e.unpersist()
    return out


def url_date_of(url) -> Column:
    """Publication date encoded in the URL path, as a struct(year, month)
    or null — the recency signal used for crawl scheduling and freshness
    weighting when the page itself carries no parseable date. Recognizes
    the two dominant CMS conventions: ``/YYYY/MM/`` segments and compact
    ``/YYYYMMDD`` path parts (month validated 01-12; day not required).
    Pure regex codegen, exactly SQL-mirrorable."""
    u = F.col(url) if isinstance(url, str) else url
    seg_y = F.regexp_extract(u, r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/", 1)
    seg_m = F.regexp_extract(u, r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/", 2)
    cmp_y = F.regexp_extract(u, r"/((?:19|20)\d{2})(0[1-9]|1[0-2])(?:[0-3]\d)?(?:/|$)", 1)
    cmp_m = F.regexp_extract(u, r"/((?:19|20)\d{2})(0[1-9]|1[0-2])(?:[0-3]\d)?(?:/|$)", 2)
    year = F.when(seg_y != "", seg_y).when(cmp_y != "", cmp_y)
    month = F.when(seg_y != "", seg_m).when(cmp_y != "", cmp_m)
    return F.when(
        year.isNotNull(),
        F.struct(year.cast("int").alias("year"), month.cast("int").alias("month")),
    )


def url_date_report(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(year, month, n_urls) histogram of URL-path publication dates —
    null-dated urls roll up under (null, null). One map-side-combined
    exchange of two small ints."""
    d = url_date_of(F.col(url_col))
    return (
        pages.select(d["year"].alias("year"), d["month"].alias("month"))
        .groupBy("year", "month")
        .agg(F.count("*").cast("bigint").alias("n_urls"))
    )


# --- CCAligned-style URL-pattern document alignment -------------------------
#
# El-Kishky et al. 2020 ("CCAligned: A Massive Collection of Cross-Lingual
# Web-Document Pairs", EMNLP) mine aligned document pairs from Common Crawl
# with NO content signal at all: strip the language identifier out of each
# URL, and documents whose URLs collapse to the same language-agnostic key
# are translations of one another. This is the no-annotation sibling of
# pagemeta.hreflang_clusters (which needs the publisher to declare
# alternates) and the seed-corpus generator for bitext.bitext_margin_pairs
# (which refines candidate pairs with embedding margins).

# The language identifiers stripped from path segments and lang= queries.
# CCAligned matches a large ISO-639 table; the module constant keeps the
# shared Spark/DuckDB regex bounded and covers the corpus + the common
# two-letter and ll-CC web conventions for these languages.
URL_LANG_CODES = (
    "en", "es", "fr", "de", "zh", "en-us", "en-gb", "es-es", "es-mx",
    "fr-fr", "fr-ca", "de-de", "zh-cn", "zh-tw",
)

# '/en/', '/fr-fr/' ... as a whole path segment (case-insensitive; both
# bounding slashes matched — no lookahead, the Java-regex/RE2 shared
# subset the repo's oracle patterns live in). A trailing '/en' before
# the filename is NOT matched — CCAligned only strips full segments,
# which is what keeps false merges rare. One segment per URL is the
# web convention this targets; adjacent segments ('/en/fr/') would
# need a second pass, documented out of scope.
_SEG_ALT = "|".join(c.replace("-", "\\-") for c in URL_LANG_CODES)
URL_LANG_SEG_RE = f"/(?i:{_SEG_ALT})/"
URL_LANG_QUERY_RE = f"([?&])lang=(?i:{_SEG_ALT})(&|$)"


def strip_url_lang(col) -> Column:
    """Language-agnostic URL key: full path segments and lang= query
    params that spell a known language code are replaced by '*'. Pure
    regexp_replace chain — pattern constants shared with the oracle
    (replacement syntax differs per engine: $1 in Spark/Java, \\1 in
    DuckDB/RE2)."""
    no_seg = F.regexp_replace(col, URL_LANG_SEG_RE, "/*/")
    return F.regexp_replace(no_seg, URL_LANG_QUERY_RE, "$1lang=*$2")


def url_aligned_pairs(
    pages: DataFrame, url_col: str = "url", lang_col: str = "lang"
) -> DataFrame:
    """Cross-lingual document pairs mined from URL structure alone:
    (url_key, lang_a, url_a, lang_b, url_b) for every unordered language
    pair sharing a language-stripped key, lang_a < lang_b.

    Scale shape: one doc is ELECTED per (key, lang) first (min url — a
    map-side-combinable struct-min groupBy, CCAligned's own one-doc-per-
    slot rule), so the self-join on the key has at most |languages| rows
    per side per key — per-key fan-out is structurally bounded by the
    language inventory (dozens), never by corpus size, and no hot-key
    salting is needed. Two shuffles total (election, key join); all
    expressions codegen."""
    keyed = pages.select(
        strip_url_lang(F.col(url_col)).alias("url_key"),
        F.col(lang_col).alias("lang"),
        F.col(url_col).alias("url"),
    )
    elected = keyed.groupBy("url_key", "lang").agg(F.min("url").alias("url"))
    a = elected.select(
        "url_key", F.col("lang").alias("lang_a"), F.col("url").alias("url_a")
    )
    b = elected.select(
        "url_key", F.col("lang").alias("lang_b"), F.col("url").alias("url_b")
    )
    return (
        a.join(b, "url_key")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .select("url_key", "lang_a", "url_a", "lang_b", "url_b")
    )
