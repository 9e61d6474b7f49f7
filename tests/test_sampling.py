"""Deterministic sampling + token-budget packing: reproducibility across
partitionings (the property DataFrame.sample lacks), nesting, stratum rates,
and the greedy budget invariants."""

import pytest
from pyspark.sql import functions as F

from readability_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10000).select(F.col("id").alias("doc_id"))


def test_sample_rate_approximate(spark, ids):
    n = deterministic_sample(ids, 0.3).count()
    assert 2700 <= n <= 3300  # ±10% of 3000; the hash is fixed, so this is stable


def test_sample_partition_independent(spark, ids):
    """Same selection no matter how the input is partitioned — the property
    that makes reruns/retries reproducible on any cluster size."""
    a = {r.doc_id for r in deterministic_sample(ids.repartition(3), 0.2).collect()}
    b = {r.doc_id for r in deterministic_sample(ids.repartition(17), 0.2).collect()}
    c = {r.doc_id for r in deterministic_sample(ids.coalesce(1), 0.2).collect()}
    assert a == b == c


def test_samples_nest(spark, ids):
    """A lower-rate sample is a strict subset of a higher-rate one (both cut
    the same hash axis) — ablation corpora stay comparable."""
    small = {r.doc_id for r in deterministic_sample(ids, 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(ids, 0.4).collect()}
    assert small < big


def test_stratified_rates(spark):
    docs = spark.range(0, 9000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = (
        stratified_sample(docs, {"en": 0.8, "es": 0.2}, default_rate=0.0)
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r.lang: r["count"] for r in out}
    assert "zh" not in got  # default_rate=0 drops unlisted strata entirely
    assert 2200 <= got["en"] <= 2600  # ~0.8 * 3000
    assert 450 <= got["es"] <= 750  # ~0.2 * 3000


def test_pack_budget_invariants(spark):
    """Greedy packing: per-source totals within budget, admitted set is
    exactly the best-quality prefix (adding the next-best excluded doc
    would bust the budget)."""
    from readability_spark.plans.pipeline import pack_by_token_budget
    from readability_spark.operators.textstats import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    budget = 600
    packed = pack_by_token_budget(docs, budget_tokens=budget).collect()
    assert packed

    q = {
        r.doc_id: r
        for r in quality_score(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .collect()
    }
    by_src: dict = {}
    for r in packed:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r.quality, r.doc_id))
        total = 0
        for r in rows:
            total += r.n_tokens
            assert r.cum_tokens == total
        assert total <= budget
        admitted = {r.doc_id for r in rows}
        ranked = sorted(
            (r for r in q.values() if r.source == src),
            key=lambda r: (-r.quality, r.doc_id),
        )
        # the admitted set is a prefix of the quality ranking, cut exactly
        # where the budget first overflows
        prefix = ranked[: len(rows)]
        assert {r.doc_id for r in prefix} == admitted
        if len(ranked) > len(rows):
            assert total + ranked[len(rows)].n_tokens > budget


def test_sampling_plan_no_shuffle(spark, ids):
    plan = (
        deterministic_sample(ids, 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_pack_binned_equals_exact(spark):
    """The two-phase histogram variant must admit the IDENTICAL set (and
    identical cum_tokens audit values) as exact greedy — binning is monotone
    in quality, so membership and offsets line up exactly."""
    from readability_spark.plans.pipeline import (
        pack_by_token_budget,
        pack_by_token_budget_binned,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for group, budget in (("lang", 1500), ("source", 600)):
        exact = {
            tuple(r) for r in pack_by_token_budget(docs, budget, group_col=group).collect()
        }
        binned = {
            tuple(r)
            for r in pack_by_token_budget_binned(docs, budget, group_col=group).collect()
        }
        assert binned == exact
        assert binned  # non-degenerate


def test_pack_binned_sorts_per_bin_not_per_group(spark):
    """Plan shape: the doc-level window partitions on (group, bin) — the
    bounded sort — and the bin-offset table joins back via broadcast."""
    from readability_spark.plans.pipeline import pack_by_token_budget_binned

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        pack_by_token_budget_binned(docs, 1500, group_col="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the final (doc-level) window must be keyed by bin as well as lang
    import re

    win_specs = re.findall(r"Window .*?partitionbyspec=\[[^\]]*\]", plan) or re.findall(
        r"Window \[[^\n]*", plan
    )
    assert any("bin" in w and "lang" in w for w in win_specs), plan


def test_sequence_pack_two_phase_equals_naive(spark):
    """The two-phase distributed prefix sum must reproduce the naive global
    running sum bit-for-bit (pure integer arithmetic), at any bucket_span,
    and docs must tile the token stream with no gaps or overlaps."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from readability_spark.plans.pipeline import pack_into_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        docs.select(
            "doc_id",
            F.greatest(F.size(F.split("text", " ")), F.lit(1)).alias("n_tokens"),
        )
        .withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .collect()
    )
    want = {r["doc_id"]: (r["n_tokens"], r["start_off"]) for r in naive}
    for span in (1, 7, 32, 10_000):
        got = pack_into_sequences(docs, seq_len=512, bucket_span=span).collect()
        assert len(got) == len(want)
        for r in got:
            n, off = want[r["doc_id"]]
            assert (r["n_tokens"], r["start_off"]) == (n, off), (span, r)
            assert r["seq_first"] == off // 512
            assert r["seq_last"] == (off + n - 1) // 512
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
    # tiling: sorted offsets are exactly the cumulative token boundaries
    rows = sorted(((off, n) for n, off in want.values()))
    pos = 0
    for off, n in rows:
        assert off == pos
        pos += n


def test_sequence_pack_windows_are_bucket_partitioned(spark):
    """Plan shape: the doc-level window partitions on pbucket (bounded
    sort); only the tiny totals table sees an unpartitioned window."""
    from readability_spark.plans.pipeline import pack_into_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = (
        pack_into_sequences(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    import re

    wins = re.findall(r"Window \[[^\n]*", plan)
    doc_wins = [w for w in wins if "n_tokens" in w and "doc_id" in w]
    assert doc_wins and all("pbucket" in w for w in doc_wins), plan


def test_chunk_sliding_coverage_and_overlap(spark):
    from readability_spark.operators.sampling import chunk_sliding

    text = " ".join(f"t{i}" for i in range(300))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_sliding(docs, chunk_tokens=128, overlap=32).collect(),
        key=lambda r: r["chunk_idx"],
    )
    step = 96
    assert [r["start_tok"] for r in rows] == [0, 96, 192, 288]
    # every token is covered and consecutive chunks overlap by exactly 32
    assert rows[0]["n_chunk_tokens"] == 128
    assert rows[-1]["n_chunk_tokens"] == 300 - 288
    for a, b in zip(rows, rows[1:]):
        covered_until = a["start_tok"] + a["n_chunk_tokens"]
        assert b["start_tok"] < covered_until  # overlap, no gap
        assert covered_until - b["start_tok"] in (32, rows[-1]["n_chunk_tokens"])


def test_chunk_sliding_short_doc_single_chunk(spark):
    from readability_spark.operators.sampling import chunk_sliding

    docs = spark.createDataFrame([(1, "only five tokens right here")], "doc_id long, text string")
    rows = chunk_sliding(docs, chunk_tokens=128, overlap=32).collect()
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 5 and rows[0]["start_tok"] == 0


def test_leakage_safe_split_clusters_never_straddle(spark):
    from readability_spark.operators.dedup import (
        near_dup_clusters,
        with_injected_duplicates,
    )
    from readability_spark.operators.sampling import leakage_safe_split

    docs = with_injected_duplicates(spark.read.parquet(f"{SF}/documents.parquet"))
    n_docs = docs.count()
    rows = leakage_safe_split(docs).collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    split_of = {r.doc_id: r.split for r in rows}
    by_cluster: dict = {}
    labels = near_dup_clusters(docs).collect()
    assert labels
    for r in labels:
        by_cluster.setdefault(r.cluster_id, set()).add(split_of[r.doc_id])
        assert next(x for x in rows if x.doc_id == r.doc_id).is_clustered
    # the leakage invariant: every cluster lands wholly in ONE split
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster


def test_split_leakage_audit_fractions_and_invariant(spark):
    from readability_spark.operators.dedup import with_injected_duplicates
    from readability_spark.operators.sampling import split_leakage_audit

    docs = with_injected_duplicates(spark.read.parquet(f"{SF}/documents.parquet"))
    n_docs = docs.count()
    rows = {r.split: r for r in split_leakage_audit(docs).collect()}
    assert set(rows) <= {"train", "val", "test"} and "train" in rows
    assert sum(r.n_docs for r in rows.values()) == n_docs
    assert all(r.straddling_pairs == 0 for r in rows.values())
    # hash-cut sizes track the weights (550 docs: generous tolerance)
    assert abs(rows["train"].n_docs / n_docs - 0.9) < 0.08
    for r in rows.values():
        assert r.n_clustered_docs >= r.n_clusters


def _waterfill_bruteforce(caps, budget):
    """Independent reference: bisect the water level lambda so that
    sum(min(cap, lambda)) == budget (all-capped when budget >= sum)."""
    if budget >= sum(caps) - 1e-9:
        return list(caps)
    lo, hi = 0.0, max(caps)
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if sum(min(c, mid) for c in caps) < budget:
            lo = mid
        else:
            hi = mid
    return [min(c, hi) for c in caps]


def test_unimax_matches_bruteforce_waterfilling(spark):
    from readability_spark.operators.sampling import unimax_allocation

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for budget, epoch_cap in [(52000.0, 2.0), (10000.0, 2.0), (10**9, 3.0)]:
        rows = sorted(
            unimax_allocation(docs, budget, epoch_cap).collect(),
            key=lambda r: (r.cap_tokens, r.domain),
        )
        caps = [r.cap_tokens for r in rows]
        ref = _waterfill_bruteforce(caps, budget)
        for r, expect in zip(rows, ref):
            assert abs(r.alloc_tokens - expect) < 1e-3, (budget, r, expect)
            assert r.capped == (abs(r.alloc_tokens - r.cap_tokens) < 1e-6)
            assert abs(r.epochs - r.alloc_tokens / r.n_tokens) < 1e-3
            assert r.epochs <= epoch_cap + 1e-9
        # allocations exhaust exactly min(budget, total cap)
        assert abs(sum(r.alloc_tokens for r in rows) - min(budget, sum(caps))) < 1e-2


def test_unimax_uniform_when_uncapped(spark):
    from readability_spark.operators.sampling import unimax_allocation

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = unimax_allocation(docs, budget_tokens=5000.0, epoch_cap=10.0).collect()
    # tiny budget, huge cap: perfectly uniform shares, nobody capped
    assert all(not r.capped for r in rows)
    share = 5000.0 / len(rows)
    assert all(abs(r.alloc_tokens - share) < 1e-6 for r in rows)


def test_temperature_mix_flattens_toward_uniform(spark):
    from readability_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    by_tau = {}
    for tau in (0.0, 0.3, 1.0):
        rows = temperature_mix(docs, budget_tokens=50000.0, tau=tau).collect()
        assert abs(sum(r.share for r in rows) - 1.0) < len(rows) * 5e-5
        assert abs(sum(r.alloc_tokens for r in rows) - 50000.0) < 1.0
        by_tau[tau] = {r.domain: r for r in rows}
    k = len(by_tau[0.0])
    # tau=0 is exactly uniform; tau=1 proportional to n_tokens
    assert all(abs(r.share - 1.0 / k) < 1e-3 for r in by_tau[0.0].values())
    tot = sum(r.n_tokens for r in by_tau[1.0].values())
    for d, r in by_tau[1.0].items():
        assert abs(r.share - r.n_tokens / tot) < 1e-3
    # intermediate tau sits between: spread(0) <= spread(0.3) <= spread(1)
    def spread(rows):
        shares = [r.share for r in rows.values()]
        return max(shares) - min(shares)

    assert spread(by_tau[0.0]) <= spread(by_tau[0.3]) <= spread(by_tau[1.0])
    # oversample flag is exactly alloc > n_tokens
    for rows in by_tau.values():
        for r in rows.values():
            assert r.oversampled == (r.alloc_tokens > r.n_tokens) or abs(
                r.alloc_tokens - r.n_tokens
            ) < 1.0


def test_quota_sample_exact_counts_and_rank_order(spark):
    from readability_spark.operators.sampling import quota_sample, unit_hash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    quotas = {"en": 50, "es": 30, "zh": 10**6}  # zh quota exceeds its size
    rows = quota_sample(docs, quotas).collect()
    by = {}
    for r in rows:
        by.setdefault(r.stratum, []).append(r)
    assert set(by) == {"en", "es", "zh"}  # unlisted strata dropped
    for lang, quota in quotas.items():
        assert len(by[lang]) == min(quota, sizes[lang]), lang
    # rank = position in (u, doc_id) order; matches a brute-force sort
    hashes = {
        r.doc_id: r.u
        for r in docs.select("doc_id").withColumn("u", unit_hash("doc_id")).collect()
    }
    for lang, members in by.items():
        members.sort(key=lambda r: r.rk)
        expect = sorted((hashes[r.doc_id], r.doc_id) for r in members)
        assert [(r.u, r.doc_id) for r in members] == expect
        assert [r.rk for r in members] == list(range(1, len(members) + 1))


def test_quota_sample_is_nested_under_quota_growth(spark):
    from readability_spark.operators.sampling import quota_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    small = {r.doc_id for r in quota_sample(docs, {"en": 20}).collect()}
    big = {r.doc_id for r in quota_sample(docs, {"en": 60}).collect()}
    assert len(small) == 20 and small < big  # growing the quota only adds


def test_curriculum_order_interleaves_domains(spark):
    """All rank-1 docs (best of each domain) come first in domain order,
    then rank-2, etc.; positions are contiguous 0..n-1."""
    from readability_spark.operators.ordering import curriculum_order

    rows = [
        (1, "a", 0.9),
        (2, "a", 0.5),
        (3, "a", 0.7),
        (4, "b", 0.8),
        (5, "b", 0.95),
        (6, "c", 0.1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "quality"])
    out = sorted(
        curriculum_order(df, n_parts=4).collect(), key=lambda r: r["position"]
    )
    assert [r["position"] for r in out] == list(range(6))
    # round 1: best of a (1), best of b (5), best of c (6); round 2: a's #2
    # (3), b's #2 (4); round 3: a's #3 (2)
    assert [r["doc_id"] for r in out] == [1, 5, 6, 3, 4, 2]
    assert [r["domain_rank"] for r in out] == [1, 1, 1, 2, 2, 3]


def test_curriculum_order_partition_independent(spark):
    from readability_spark.operators.ordering import curriculum_order

    rows = [
        (i, "d%d" % (i % 5), float((i * 37) % 100) / 100.0) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "quality"])
    a = sorted(map(tuple, curriculum_order(df, n_parts=8).collect()))
    b = sorted(
        map(tuple, curriculum_order(df.repartition(17), n_parts=3).collect())
    )
    assert a == b
