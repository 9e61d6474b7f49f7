"""Johnson–Lindenstrauss random projection — the embedding-pipeline
dimensionality reducer (Achlioptas 2003 database-friendly variant:
Rademacher ±1 signs, scaled 1/sqrt(k)).

At 10^12 vectors the projection is a pure per-row codegen projection
(zero shuffles, zero Python): each output coordinate is a fixed
±vec[i] chain. The sign matrix is derived from md5("<i>:<j>") — data-
independent and engine-portable, so the SQL oracle regenerates the
IDENTICAL matrix and, because both engines evaluate the same left-deep
addition chain over float→double casts, the result matches bit-for-bit
before the final rounding.

Use: shrink 1024-d embeddings to 64-d for the coarse stages (IVF lists,
LSH bucketing, SemDeDup clustering) at 1/16 the scan bandwidth, keeping
pairwise distances within (1±eps) with the standard JL guarantee.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_signs(in_dim: int, out_dim: int) -> list:
    """out_dim lists of in_dim ±1 ints, from md5('<i>:<j>') — the shared
    deterministic source for the Spark expression AND the SQL oracle."""
    return [
        [
            1 if hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0] < "8" else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    prefix: str = "p",
) -> DataFrame:
    """Append ``out_dim`` projected coordinates ``{prefix}00..`` — one
    codegen projection, no shuffle."""
    signs = jl_signs(in_dim, out_dim)
    scale = repr(1.0 / math.sqrt(out_dim))
    cols = []
    # Each chain as ONE parsed SQL expression: building the same left-deep
    # tree from Python Column objects costs ~in_dim·out_dim py4j round
    # trips (2,000+ driver calls for 64→16) before a single row moves;
    # the parsed tree is node-for-node identical, so values are still
    # bit-for-bit the oracle's.
    for j, row in enumerate(signs):
        chain = "CAST(0.0 AS DOUBLE)"
        for i, s in enumerate(row):
            op = "+" if s > 0 else "-"
            chain = f"({chain} {op} CAST({vec_col}[{i}] AS DOUBLE))"
        cols.append(
            F.expr(f"({chain}) * {scale}").alias(f"{prefix}{j:02d}")
        )
    return df.select("*", *cols)


def jl_project_sql(
    vec_expr: str,
    in_dim: int = 64,
    out_dim: int = 16,
    prefix: str = "p",
) -> list:
    """The identical projection as (name, sql_expr) pairs (1-based array
    indexing) — the oracle mirror of :func:`jl_project`."""
    signs = jl_signs(in_dim, out_dim)
    scale = repr(1.0 / math.sqrt(out_dim))
    out = []
    for j, row in enumerate(signs):
        chain = "0.0::double"
        for i, s in enumerate(row):
            op = "+" if s > 0 else "-"
            chain = f"({chain} {op} ({vec_expr}[{i + 1}])::double)"
        out.append((f"{prefix}{j:02d}", f"({chain}) * {scale}"))
    return out
