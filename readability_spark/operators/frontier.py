"""Crawl-frontier prioritization: discovered links → what to fetch next.

The step between outlink extraction (``operators/links.py``) and the next
crawl wave. Given the page-level link discoveries, the set of already
crawled urls, and optional per-host quality scores (e.g. host PageRank
from ``operators/graph.py``), :func:`prioritize_frontier` emits the
uncrawled urls ranked by priority with a per-host politeness cap.

Priority is deliberately simple and engine-reproducible arithmetic:

    priority = host_score * n_refs / (1 + depth)

- ``n_refs`` — how many discovered links point at the url (more in-links
  discovered → fetch sooner);
- ``depth`` — path-segment count (shallow pages first, the standard
  frontier heuristic);
- ``host_score`` — optional external prior, default 1.0.

Scale shape: one map-side-combined groupBy(href) collapses the raw
discovery stream (10^12+ link rows) to distinct candidate urls; the
already-crawled check is a shuffle anti-join on url (both sides hashed on
the key — at crawl scale the crawled set is far too big to broadcast, and
AQE turns this into a skew-split sort-merge join); the politeness cap is
the salted two-phase top-k (``snapshots.domain_top_k`` shape) so a
giant host's million candidates never sort in one task. Salting cannot
change the result — a row outside its salt group's top-k cannot be in
the host's top-k — so the output is identical to a single-window rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4
from readability_spark.operators.urltools import host_of


def url_depth(col) -> "F.Column":
    """Non-empty path-segment count: http://h/a/b/x.html → 3, http://h/ → 0."""
    path = F.regexp_replace(col, r"^[a-zA-Z]+://[^/]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    return F.size(F.filter(F.split(path, "/"), lambda x: x != ""))


def prioritize_frontier(
    discovered: DataFrame,
    crawled: DataFrame,
    host_scores: DataFrame | None = None,
    k_per_host: int = 100,
    href_col: str = "href",
    crawled_url_col: str = "url",
    n_salts: int = 16,
) -> DataFrame:
    """(host, href, n_refs, depth, priority, rk) for uncrawled candidates,
    at most ``k_per_host`` per host, best-priority-first.

    ``host_scores``, if given, is (host, host_score) — assumed small
    relative to the frontier (10^7 hosts vs 10^12 urls) and broadcast.
    """
    cand = (
        discovered.groupBy(F.col(href_col).alias("href"))
        .agg(F.count("*").alias("n_refs"))
        .join(
            crawled.select(F.col(crawled_url_col).alias("href")).distinct(),
            "href",
            "left_anti",
        )
        .select(
            host_of(F.col("href")).alias("host"),
            "href",
            "n_refs",
            url_depth(F.col("href")).alias("depth"),
        )
    )
    if host_scores is not None:
        cand = cand.join(F.broadcast(host_scores), "host", "left")
        score = F.coalesce(F.col("host_score"), F.lit(1.0))
    else:
        score = F.lit(1.0)
    cand = cand.select(
        "host",
        "href",
        "n_refs",
        "depth",
        round4(
            score * F.col("n_refs").cast("double") / (F.lit(1.0) + F.col("depth").cast("double"))
        ).alias("priority"),
    )

    order = [F.col("priority").desc(), F.col("href").asc()]
    w1 = Window.partitionBy("host", F.col("_salt")).orderBy(*order)
    phase1 = (
        cand.withColumn("_salt", F.pmod(F.xxhash64("href"), F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k_per_host)
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k_per_host)
        .select("host", "href", "n_refs", "depth", "priority", "rk")
    )


def crawl_budget_waterfill(
    ranks: DataFrame,
    budget: float,
    per_host_cap: float,
    node_col: str = "node",
    weight_col: str = "rank",
) -> DataFrame:
    """Importance-weighted crawl budget allocation under politeness:
    split ``budget`` fetches across hosts proportional to their
    authority weight (e.g. PageRank), but no host above
    ``per_host_cap`` fetches — the weighted waterfilling optimum. The
    heaviest hosts saturate the cap; the remaining budget splits
    proportionally among the rest at the water level
    lambda = (B - t*c) / (W - CW_t), where t is the capped-prefix size
    in weight-descending order.

    Same closed-form window shape as ``sampling.unimax_allocation``:
    everything beyond the (already tiny) per-host weight table is
    window arithmetic over K host rows — a driver-sized frame. Feed it
    the ROUND4ED weights (e.g. the link_pagerank query's output) and
    the allocation is bit-reproducible across engines.

    Output: (host, weight, alloc_fetches, share, capped).
    """
    b, c = float(budget), float(per_host_cap)
    wo = Window.orderBy(F.desc("w"), F.asc("host"))
    wall = Window.partitionBy()
    s1 = (
        ranks.select(
            F.col(node_col).alias("host"), F.col(weight_col).cast("double").alias("w")
        )
        .withColumn("j", F.row_number().over(wo))
        .withColumn("cw", F.sum("w").over(wo))
        .withColumn("wtot", F.sum("w").over(wall))
    )
    flag = (F.col("w") * (F.lit(b) - (F.col("j") - 1) * F.lit(c))) >= (
        F.lit(c) * (F.col("wtot") - (F.col("cw") - F.col("w")))
    )
    s2 = s1.withColumn(
        "t", F.max(F.when(flag, F.col("j")).otherwise(0)).over(wall)
    ).withColumn(
        "cw_t",
        F.coalesce(
            F.max(F.when(F.col("j") == F.col("t"), F.col("cw"))).over(wall),
            F.lit(0.0),
        ),
    )
    lam = (F.lit(b) - F.col("t") * F.lit(c)) / (F.col("wtot") - F.col("cw_t"))
    alloc = F.when(F.col("j") <= F.col("t"), F.lit(c)).otherwise(F.col("w") * lam)
    return s2.select(
        "host",
        round4(F.col("w")).alias("weight"),
        round4(alloc).alias("alloc_fetches"),
        round4(alloc / F.lit(b)).alias("share"),
        (F.col("j") <= F.col("t")).alias("capped"),
    )
