"""Rendezvous (highest-random-weight) shard planning — minimal-movement
resharding for a 10^12-row corpus.

When a bucketed corpus grows from N to M shards, naive ``hash(key) % M``
remaps ~(1 - 1/M) of ALL keys — a full-corpus rewrite. Rendezvous hashing
(Thaler & Ravishankar 1998; the scheme behind Riak/Ceph-style placement)
assigns each key to ``argmax over shards s of h(key, s)``: when shards are
only ADDED, a key moves iff one of the new shards wins its argmax, so
exactly ~(M-N)/M of keys move — the information-theoretic minimum — and
every move lands on a NEW shard (no churn between surviving shards; the
property test pins this).

Engine determinism / oracle parity: the per-(key, shard) weight is
``md5(key || '#' || s)`` compared lexicographically (md5 hex is fixed-width
so string order is value order), and the argmax is carried as the string
``weight || ':' || lpad(s, 2)`` reduced with max() — bit-identical in Spark
and DuckDB, no engine RNG anywhere.

Scale shape: assignment is pure per-row codegen over a broadcast-free
column expression (M md5 calls per row, M ≤ ~64 for a planning table;
for 10^5-shard fleets the same argmax runs over an exploded shard range
instead). The report is ONE map-side-combined groupBy(new_shard) — a
single shuffle of M·cores partial rows. The moved-bytes estimate rides
the same aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Winning shard id (int) for ``key`` among shards 0..n_shards-1 by
    highest md5 weight. ``lpad`` keeps the tie-break suffix fixed-width;
    md5 ties across distinct shard suffixes are not a practical concern
    (that would be an md5 collision)."""
    assert 1 <= n_shards <= 100, "2-digit shard suffix; widen lpad for more"
    tagged = [
        F.concat(
            F.md5(F.concat(key, F.lit(f"#{s}"))),
            F.lit(":"),
            F.lit(f"{s:02d}"),
        )
        for s in range(n_shards)
    ]
    return F.substring(F.array_max(F.array(*tagged)), 34, 2).cast("int")


def reshard_plan(
    df: DataFrame,
    key_col: str,
    n_old: int,
    n_new: int,
    bytes_col: str | None = None,
) -> DataFrame:
    """Per-new-shard movement plan for growing ``n_old`` -> ``n_new``
    rendezvous shards: (new_shard, n_keys, n_moved_in, moved_bytes).

    ``n_moved_in`` counts keys whose old assignment differs — under HRW
    growth these are exactly the keys landing on shards >= n_old, so the
    sum over all rows / total keys ~= (n_new - n_old) / n_new, the minimal
    movement fraction (vs ~1 - 1/n_new for modulo resharding).
    ``bytes_col`` (optional) sizes the physical copy the plan implies.
    """
    key = F.col(key_col)
    nbytes = F.col(bytes_col).cast("long") if bytes_col else F.length(key).cast("long")
    assigned = df.select(
        rendezvous_shard(key, n_old).alias("old_shard"),
        rendezvous_shard(key, n_new).alias("new_shard"),
        nbytes.alias("nb"),
    )
    moved = (F.col("old_shard") != F.col("new_shard")).cast("long")
    return (
        assigned.groupBy("new_shard")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(moved).alias("n_moved_in"),
            F.sum(moved * F.col("nb")).alias("moved_bytes"),
        )
        .select("new_shard", "n_keys", "n_moved_in", "moved_bytes")
    )
