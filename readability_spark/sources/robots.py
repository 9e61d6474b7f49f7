"""robots.txt source: deterministic writer, distributed parser, and the
crawl-permission filter a polite web-scale pipeline applies before fetching
(or before keeping) a url.

robots.txt (RFC 9309) is the one per-host sidecar file every crawl pipeline
must consult. This module implements the standard's core:

- **group selection**: rules belong to the nearest preceding ``User-agent``
  line; a crawler uses its own agent's group when one exists, else the
  ``*`` group, else everything is allowed (no robots file == allow).
- **rule matching**: a rule applies when its path prefix is a prefix of the
  url path; the **longest** matching rule wins, and on a length tie
  ``Allow`` beats ``Disallow`` (Google/RFC 9309 precedence). An empty
  ``Disallow:`` line matches nothing (allow-all idiom).

Documented subset: ``*``/``$`` wildcards inside rule paths and stacked
``User-agent`` lines sharing one group are not implemented (rare; the
parser treats each rule as belonging to the nearest agent line only).

Everything is JVM column expressions — split/explode/regexp for the parser,
joins + one aggregation for the filter — so the whole path has an exact
DuckDB oracle and no Python in the loop.

Scale shape: the rules table is robots-corpus-sized (hosts × rules-per-host;
robots files are capped ~500 KB and typically tens of rules), orders of
magnitude smaller than the url corpus, so the filter broadcasts it by
default. For a truly huge host universe set ``broadcast_rules=False``: the
join keys on host, per-url fan-out stays bounded by rules-per-host, and AQE
skew handling covers giant hosts. The verdict aggregation is
``max(struct(...))`` under ``groupBy(url)`` — map-side combined, skew-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

AGENT_RE = r"(?i)^user-agent:[ \t]*([^ \t#]+)"
RULE_RE = r"(?i)^(allow|disallow):[ \t]*([^ \t#]*)"


def synthesize_robots(docs: DataFrame) -> DataFrame:
    """One deterministic robots.txt blob per host (host = source +
    '.example.com'), with per-host variety keyed on md5(host) so the parse →
    filter path exercises every branch: a full ``trainingbot`` block, a
    ``Disallow`` everyone shares, a deeper Disallow/Allow pair that only
    longest-match precedence resolves, comments, and an ignored extension
    directive (Crawl-delay)."""
    hosts = docs.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host")
    ).distinct()
    hx = F.substring(F.md5(F.col("host")), 1, 1)
    lines = F.array_compact(
        F.array(
            F.concat(F.lit("# synthetic robots for "), F.col("host")),
            F.when(hx.isin("0", "1"),
                   F.lit("User-agent: trainingbot\nDisallow: /")),
            F.lit("User-agent: *"),
            F.lit("Disallow: /private/"),
            F.when(hx.isin(*"01234567"), F.lit("Disallow: /archive/")),
            F.when(hx.isin("0", "1", "2", "3"), F.lit("Allow: /archive/2")),
            F.when(hx.isin("4", "5"), F.lit("Crawl-delay: 2")),
            F.lit("Disallow:"),  # empty rule: allow-all idiom, must be inert
        )
    )
    return hosts.select("host", F.concat_ws("\n", lines).alias("robots_txt"))


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → one row per rule: (host, agent, directive,
    prefix). Comments stripped; rules bind to the nearest preceding
    User-agent line; rules before any agent line are dropped; empty-prefix
    rules are kept (they match nothing but are part of the group)."""
    lines = robots.select(
        "host", F.posexplode(F.split("robots_txt", "\n")).alias("ln", "line")
    ).select(
        "host", "ln",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    tagged = lines.select(
        "host", "ln", "line",
        F.nullif(F.lower(F.regexp_extract("line", AGENT_RE, 1)), F.lit("")).alias("agent_decl"),
        F.lower(F.regexp_extract("line", RULE_RE, 1)).alias("directive"),
        F.regexp_extract("line", RULE_RE, 2).alias("prefix"),
    )
    w = Window.partitionBy("host").orderBy("ln").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_agent = tagged.withColumn(
        "agent", F.last("agent_decl", ignorenulls=True).over(w)
    )
    return with_agent.filter(
        (F.col("directive") != "") & F.col("agent").isNotNull()
    ).select("host", "agent", "directive", "prefix")


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "trainingbot",
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Verdict per url: (url, host, matched_prefix, allowed).

    ``matched_prefix`` is the winning rule's path prefix (NULL when no rule
    matched); ``allowed`` follows RFC 9309 precedence (longest match, Allow
    wins length ties, no match / no robots == allowed).
    """
    from readability_spark.operators.urltools import host_of, path_of

    # group selection: the agent's own group when the host has one, else '*'
    has_own = rules.groupBy("host").agg(
        F.max(F.when(F.col("agent") == agent.lower(), 1).otherwise(0)).alias("_own")
    )
    chosen = (
        rules.join(has_own, "host")
        .filter(
            ((F.col("_own") == 1) & (F.col("agent") == agent.lower()))
            | ((F.col("_own") == 0) & (F.col("agent") == "*"))
        )
        .select("host", "directive", "prefix")
    )
    if broadcast_rules:
        chosen = F.broadcast(chosen)
    base = urls.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        path_of(F.col(url_col)).alias("path"),
    )
    joined = base.join(chosen, "host", "left").withColumn(
        "_match",
        F.when(
            (F.col("prefix") != "") & F.startswith(F.col("path"), F.col("prefix")),
            F.struct(
                F.length("prefix").alias("ln"),
                F.when(F.col("directive") == "allow", 1).otherwise(0).alias("allow"),
                F.col("prefix").alias("prefix"),
            ),
        ),
    )
    return (
        joined.groupBy("url", "host")
        .agg(F.max("_match").alias("m"))
        .select(
            "url",
            "host",
            F.col("m.prefix").alias("matched_prefix"),
            (F.col("m").isNull() | (F.col("m.allow") == 1)).alias("allowed"),
        )
    )
