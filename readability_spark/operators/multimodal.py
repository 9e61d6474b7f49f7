"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
structs; decode / feature-extract run as Arrow-batched ``mapInPandas`` (the
same execution shape as the html extraction UDF). The actual codec step is a
deterministic STUB (no image/audio libraries in this container — see
``decode_image_stub``); the Spark-side plumbing — schema, batch shape,
partitioning, binary transport — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sha", StringType(), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, payload: binary). Deterministic fake
    payloads (utf-8 of text) standing in for image/audio bytes."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> tuple:
    """STUB decode: real deployments plug PIL/ffmpeg here. Deterministic fake
    dimensions derived from the payload length so tests/oracles can verify
    the plumbing end-to-end. Raises NotImplementedError for real codecs."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h, nf = decode_image_stub(raw)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "byte_len": len(raw),
                        "width": w,
                        "height": h,
                        "n_frames": nf if mt == "video/mp4" else 1,
                        "sha": hashlib.sha256(raw).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)
