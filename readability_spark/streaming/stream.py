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


def stream_dedup_first_seen(
    spark: SparkSession,
    pages_path: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    out_path: "str | None" = None,
):
    """Custom stateful streaming operator (applyInPandasWithState): emit each
    url the first time it is ever seen across micro-batches, drop re-crawls.

    State is partitioned by the url-hash bucket (the same salt key as the
    batch pipeline) so per-key state stays bounded and shuffles are keyed on
    8 bytes. Each bucket's state is the set of url fingerprints seen so far —
    at production scale back this with the RocksDB state store and a TTL
    (timeout) instead of the default in-memory store; the operator shape is
    identical.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("bucket", LongType(), True),
            StructField("url", StringType(), True),
            StructField("first_seen_batch", LongType(), True),
        ]
    )
    state_schema = StructType([StructField("seen", ArrayType(StringType()), True)])

    def dedup_fn(key, pdfs, state: "GroupState"):
        import hashlib

        import pandas as pd

        seen = set(state.get[0]) if state.exists else set()
        batch_id = len(seen)  # monotone-ish marker; exact id not required
        out = []
        for pdf in pdfs:
            for u in pdf["url"]:
                fp = hashlib.md5(u.encode("utf-8")).hexdigest()
                if fp not in seen:
                    seen.add(fp)
                    out.append((key[0], u, batch_id))
        state.update((sorted(seen),))
        yield pd.DataFrame(out, columns=["bucket", "url", "first_seen_batch"])

    schema = spark.read.parquet(pages_path).schema
    pages = spark.readStream.schema(schema).parquet(pages_path)
    keyed = (
        pages.select("url")
        .withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))
        .groupBy("bucket")
    )
    deduped = keyed.applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = deduped.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    ).trigger(availableNow=True)
    if out_path:
        # durable sink: state + offsets recover across runs — re-running with
        # the same checkpoint emits only urls never seen before (incremental
        # crawl ingestion)
        query = writer.format("parquet").option("path", out_path).start()
        query.awaitTermination()
        return spark.read.parquet(out_path)
    # memory sink for demos/tests (does not support checkpoint recovery)
    query = writer.format("memory").queryName("first_seen_urls").start()
    query.awaitTermination()
    return spark.table("first_seen_urls")


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
