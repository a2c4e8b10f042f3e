"""Multimodal (binary) column plumbing (SURVEY.md §7 F).

Images / audio / video ride through the engine as opaque ``binary`` columns
with typed metadata alongside. The Spark-side machinery — schema, Arrow
batch shape, ``mapInPandas`` signatures, partition sizing — is real and
tested; the actual media decode is stubbed (codec libraries are not in this
container) behind ``decode_stub``, exactly where a pillow/ffmpeg call would
slot in.

Scale notes: binary payloads blow past ``spark.sql.files.maxPartitionBytes``
quickly — pipelines should carry (metadata + storage pointer) and late-fetch
bytes inside ``mapInPandas``, or cap batch size via
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of 100 MB videos
doesn't OOM one Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video|text
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("payload_sha256", StringType()),
        StructField("decode_status", StringType()),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> str:
    """Where pillow/librosa/ffmpeg decode would run. Deterministic stub:
    flags empty payloads, accepts the rest."""
    if payload is None or len(payload) == 0:
        return "empty"
    if media_type not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    return "ok"


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Python worker receives pandas batches (Arrow
    transfer, zero row-at-a-time overhead) and emits the typed feature
    frame. This is the canonical shape for any decode/resize/frame-sample
    stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: 0 if b is None else len(b)).astype(
                        "int64"
                    ),
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "decode_status": [
                        decode_stub(p, t)
                        for p, t in zip(payloads, pdf["media_type"])
                    ],
                }
            )

    from network_iq_spark.operators import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(batches, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the media
    plumbing is exercised end-to-end on real tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
