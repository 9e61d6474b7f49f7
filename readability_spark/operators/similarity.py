"""Similarity search over the `embeddings` table (array<float> column).

- Brute-force cosine top-k: broadcast the (small) query set against all
  vectors; dot products via zip_with/aggregate — JVM-side, codegen'd,
  accumulation order fixed left-to-right in double so the DuckDB oracle
  reproduces the exact same floats.
- Hyperplane-LSH bucketed variant (the 100-TB path): sign-bit bucket keys
  against a deterministic, data-derived plane set (the first `n_planes`
  vectors), then exact rerank within buckets only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_spark.operators.dedup import round4


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10, round_to: int = 4
) -> DataFrame:
    """Exact top-k neighbors for the first n_queries vectors (excluding self).

    Plan shape: broadcast(queries) × vectors → per-row dot product → window
    top-k. One scan of the big side; no shuffle besides the top-k.
    """
    from pyspark.sql.window import Window

    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        round4(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (_norm(F.col("q_emb")) * _norm(F.col("embedding")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_bucket(emb: DataFrame, planes: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-bit bucket id per vector against broadcast hyperplanes."""
    p = planes.select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("p_emb")
    ).filter(F.col("plane_id") < n_planes)
    signed = (
        emb.join(F.broadcast(p))
        .select(
            "vec_id",
            "plane_id",
            F.when(_dot(F.col("embedding"), F.col("p_emb")) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy("vec_id")
        .agg(F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("plane_id")).cast("long")).alias("bucket"))
    )
    return signed


def with_injected_near_dups(emb: DataFrame, every: int = 10) -> DataFrame:
    """Deterministically re-append every `every`-th vector under a new id so
    near-dup queries have a known non-empty answer (cosine == 1 pairs)."""
    dups = emb.filter(F.col("vec_id") % every == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    return emb.unionByName(dups)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, n_planes: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale path).

    Identical/near-identical vectors land in the same sign-bit bucket with
    high probability, so the quadratic compare runs per-bucket instead of
    all-pairs: at 10^12 vectors with 2^n_planes buckets the candidate volume
    is sum(b_i^2) ≈ N^2/2^n_planes — tune n_planes so the expected bucket
    fits one task. The bucket self-join shuffles 8-byte keys only; embeddings
    are re-joined for the exact cosine rerank afterwards.
    """
    buckets = lsh_bucket(emb, emb, n_planes)
    wb = emb.join(buckets, "vec_id")
    a = wb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    b = wb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    cands = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = cands.select(
        "id_a",
        "id_b",
        round4(
            _dot(F.col("emb_a"), F.col("emb_b"))
            / (_norm(F.col("emb_a")) * _norm(F.col("emb_b")))
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


def lsh_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = 8, round_to: int = 4
) -> DataFrame:
    """ANN variant: candidates share the query's LSH bucket; exact rerank
    inside the bucket. The scale path — per-bucket work instead of full scan."""
    from pyspark.sql.window import Window

    planes = emb  # data-derived deterministic planes: first n_planes vectors
    buckets = lsh_bucket(emb, planes, n_planes)
    with_bucket = emb.join(buckets, "vec_id")
    q = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = with_bucket.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        round4(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (_norm(F.col("q_emb")) * _norm(F.col("embedding")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
