"""Bloom-filter incremental dedup: new-batch vs historical-corpus filtering.

The recurring crawl problem: a new batch of documents arrives and must be
checked against everything already ingested (10^12 rows of history). A
plain anti-join shuffles the ENTIRE batch against the history index; a
Bloom filter built over the history keys prunes that to almost nothing:

1. build a bitmap over history keys — distributed: each partition sets its
   keys' bits in a local numpy bitmap (vectorized), partials OR-combined
   with ``treeReduce`` (log-depth, bitmap-sized traffic per level);
2. broadcast the bitmap; probe the batch with a vectorized pandas UDF —
   rows the filter rejects are **definitely new** (Bloom filters have no
   false negatives) and skip the join entirely;
3. the small surviving candidate set (true re-crawls + ~fpp of the batch)
   is exact-verified with an anti-join against history.

Step 3 makes the operator's OUTPUT exactly equal to the plain anti-join —
the Bloom layer is a pure physical optimization, which is what lets the
DuckDB oracle state the semantics as ``NOT EXISTS``.

All hashing is JVM-side (md5 halves via the same conv() trick the other
operators use); Python only does numpy bit math on int64 columns. The two
32-bit halves drive standard double hashing h_i = h1 + i*h2 (Kirsch-
Mitzenmacher), so k probes cost two hashes total.

Sizing at 10^12 history keys: a single bitmap at 1% fpp would be ~1.2 TB —
at that scale the filter must be partitioned (one bloom per history bucket,
probed after co-partitioning batch and history on the same key hash), or
replaced by the exact bucket-anti-join the pipeline already has
(plans/pipeline.py resume path). The single-bitmap form here is the right
shape up to ~10^9 keys (1.2 GB broadcast); past that, shard it. The
``m_bits`` cap makes the memory contract explicit rather than implicit.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_M_BITS = 1 << 33  # 1 GiB bitmap — explicit single-bitmap ceiling


def _h32(col: str, offset: int) -> Column:
    """32-bit unsigned int from md5 hex nibbles [offset, offset+8) — the
    repo-standard portable hash (value-identical in DuckDB if ever needed)."""
    return F.expr(
        f"cast(conv(substr(md5(cast({col} as string)), {1 + offset}, 8), 16, 10) as bigint)"
    )


def with_bloom_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Append the double-hashing bases (h1, h2); h2 forced odd so the probe
    sequence never degenerates."""
    return df.withColumn("_bh1", _h32(key_col, 0)).withColumn(
        "_bh2",
        F.expr(
            f"cast(conv(substr(md5(cast({key_col} as string)), 9, 8), 16, 10) as bigint) | 1"
        ),
    )


def bloom_params(n_items: int, fpp: float = 0.01) -> Tuple[int, int]:
    """Optimal (m_bits, k) for n items at target fpp; m rounded up to a
    byte multiple and capped at the explicit single-bitmap ceiling."""
    n_items = max(1, n_items)
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = min(((m + 7) // 8) * 8, _MAX_M_BITS)
    k = max(1, round(m / n_items * math.log(2)))
    return m, int(k)


def _set_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> None:
    for i in range(k):
        pos = (h1 + i * h2) % m
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + i * h2) % m
        hit &= (bitmap[pos >> 3] >> (pos & 7)).astype(np.uint8) & 1 == 1
    return hit


def build_bloom(
    history: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    n_items: Optional[int] = None,
) -> Tuple[np.ndarray, int, int]:
    """History DataFrame → (bitmap uint8 array, m_bits, k).

    Distributed build: every partition folds its rows into a local bitmap
    (numpy-vectorized per Arrow-sized chunk), then partials are OR-combined
    in a tree (log-depth; per-level traffic = bitmap size × fan-in).
    ``n_items=None`` costs one count() to size the filter — pass the known
    history cardinality at scale to skip it (same convention as the ANN
    auto-derivation)."""
    hashed = with_bloom_hashes(history, key_col).select("_bh1", "_bh2")
    if n_items is None:
        n_items = hashed.count()
    m, k = bloom_params(n_items, fpp)

    def partition_bitmap(rows):
        bm = np.zeros(m // 8, dtype=np.uint8)
        h1s, h2s = [], []
        for r in rows:
            h1s.append(r[0])
            h2s.append(r[1])
            if len(h1s) >= 65536:
                _set_bits(bm, np.asarray(h1s, np.int64), np.asarray(h2s, np.int64), m, k)
                h1s, h2s = [], []
        if h1s:
            _set_bits(bm, np.asarray(h1s, np.int64), np.asarray(h2s, np.int64), m, k)
        yield bm

    bitmap = hashed.rdd.mapPartitions(partition_bitmap).treeReduce(np.bitwise_or)
    return bitmap, m, k


def bloom_probe(
    batch: DataFrame, bitmap: np.ndarray, m: int, k: int, key_col: str
) -> DataFrame:
    """Append ``maybe_seen``: False ⇒ key definitely not in history (no
    false negatives); True ⇒ verify exactly. Bitmap ships once per executor
    via SparkContext broadcast; the probe is numpy over int64 columns."""
    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def maybe(h1, h2):
        import pandas as pd

        return pd.Series(
            _test_bits(bc.value, h1.to_numpy(np.int64), h2.to_numpy(np.int64), m, k)
        )

    return (
        with_bloom_hashes(batch, key_col)
        .withColumn("maybe_seen", maybe(F.col("_bh1"), F.col("_bh2")))
        .drop("_bh1", "_bh2")
    )


def incremental_new_docs(
    batch: DataFrame,
    history: DataFrame,
    key_col: str = "text",
    fpp: float = 0.01,
    n_history: Optional[int] = None,
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` does not appear in ``history`` —
    exactly anti-join semantics, Bloom-accelerated.

    Only bloom-positive candidates reach the anti-join (≈ true matches +
    fpp × batch), so the shuffle carries a sliver of the batch instead of
    all of it. The history side of the join is reduced the same way at the
    source: at scale the join's history scan benefits from partition
    pruning on the candidates' key range; here it ships only key_col."""
    bitmap, m, k = build_bloom(history, key_col, fpp=fpp, n_items=n_history)
    probed = bloom_probe(batch, bitmap, m, k, key_col)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    candidates = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = candidates.join(
        history.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
    return definitely_new.unionByName(verified_new)
