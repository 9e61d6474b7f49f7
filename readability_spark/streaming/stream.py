"""Structured Streaming ingestion mode (optional per SURVEY.md §1.4).

The reference is batch-only; at pipeline level a crawl feed is naturally a
stream. This module provides:

- ``stream_events``: file-source stream over the events table with a
  watermark + tumbling-window aggregation (late data handled by watermark);
- ``stream_extract``: the extraction UDF applied to a streaming page source
  (identical operator; mapInPandas works unchanged on streams);
- both runnable with ``availableNow`` trigger so batch parity is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming aggregation (oracle-checkable)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, out_table: str = "stream_counts"
):
    """availableNow streaming run of the same windowed aggregation, with a
    10-minute watermark; results land in an in-memory sink table."""
    import os

    # file streams require a directory source; stage the table into one
    src_dir = os.path.join(checkpoint_dir + "_src", "events")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch.write.mode("overwrite").parquet(src_dir)
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        # watermarks require TIMESTAMP (parquet column is TIMESTAMP_NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    query = (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(out_table)


def stream_extract(spark: SparkSession, pages_path: str, checkpoint_dir: str, out_path: str):
    """Streaming extraction: readStream(parquet pages) → extract → parquet."""
    from readability_spark.operators.extract import extract

    schema = spark.read.parquet(pages_path).schema
    pages = spark.readStream.schema(schema).parquet(pages_path)
    articles = extract(pages, include_html=False)
    query = (
        articles.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_path)
