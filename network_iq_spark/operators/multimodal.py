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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("decode_status", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_media(df: DataFrame, max_w: int = 336, max_h: int = 336) -> DataFrame:
    """Aspect-preserving resize stage. The target-dimension arithmetic is
    REAL and runs JVM-side (pure integer expressions — no Python for the
    metadata math); only the pixel resample is stubbed where pillow would
    run, passing the payload through with a decode marker. Rows with no
    dimensions (audio/text) pass through unresized. MAP-ONLY.

    target = floor(dim · s) with s = min(max_w/w, max_h/h, 1) — computed as
    integer cross-multiplication (w·max_h ≷ h·max_w picks the binding
    side) so both engines and any future SQL twin agree exactly.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": pdf["target_w"],
                    "target_h": pdf["target_h"],
                    # pillow Image.resize((target_w, target_h)) goes here
                    "payload": pdf["payload"],
                    "decode_status": [
                        decode_stub(p, t)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    w, h = F.col("width"), F.col("height")
    no_dims = w.isNull() | h.isNull() | (w <= 0) | (h <= 0)
    fits = (w <= max_w) & (h <= max_h)
    # binding side by integer cross-multiplication; floor division is exact
    width_bound = (w * max_h) >= (h * max_w)
    tw = (
        F.when(no_dims | fits, w)
        .when(width_bound, F.lit(max_w))
        .otherwise((w * max_h) / h)
    )
    th = (
        F.when(no_dims | fits, h)
        .when(width_bound, (h * max_w) / w)
        .otherwise(F.lit(max_h))
    )
    prepped = df.select(
        "media_id",
        "payload",
        "media_type",
        F.floor(tw).cast("int").alias("target_w"),
        F.floor(th).cast("int").alias("target_h"),
    )
    from network_iq_spark.operators import ensure_parallelism

    return ensure_parallelism(prepped).mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    timestamp (bounded explode — fanout = min(duration/every_ms,
    max_frames), computed from METADATA before any Python runs, so the
    blow-up is capped in the plan, not discovered in a worker). The frame
    decode is stubbed with a deterministic payload digest where the ffmpeg
    seek+decode would run; the schema, timestamps, and batch shape are the
    real contract a CLIP-style embedding stage consumes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # ffmpeg -ss <ts_ms> decode goes here; deterministic stub frame
            frames = [
                hashlib.sha256((b or b"") + ts.to_bytes(8, "big")).digest()
                for b, ts in zip(pdf["payload"], pdf["ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "frame": frames,
                }
            )

    vids = df.filter(
        (F.col("media_type") == "video") & (F.col("duration_ms") > 0)
    )
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.col("duration_ms") / every_ms).cast("int")),
    )
    exploded = vids.select(
        "media_id",
        "payload",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "payload",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
    )
    from network_iq_spark.operators import ensure_parallelism

    return ensure_parallelism(exploded).mapInPandas(batches, schema=FRAME_SCHEMA)
