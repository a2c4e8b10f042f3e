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
    """Where librosa/ffmpeg decode would run for audio/video (codec libs
    are not in this container). Deterministic stub: flags empty payloads,
    accepts the rest. IMAGES are no longer stubbed — see
    :func:`decode_image` (pure-numpy PGM/PPM/BMP)."""
    if payload is None or len(payload) == 0:
        return "empty"
    if media_type not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    return "ok"


# ---------------------------------------------------------------------------
# Real image codecs — pure numpy, no native deps
# ---------------------------------------------------------------------------
#
# PGM (P5, 8-bit gray), PPM (P6, 8-bit RGB) and uncompressed 24-bit BMP
# cover the "actual pixels" tier: decode → ndarray, deterministic
# nearest-neighbor resample, re-encode. Formats outside this set fall back
# to the pass-through stub (honest about what a pillow-less container can
# decode); the Spark-side batch plumbing is identical either way.


def _pnm_header(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """Parse a PNM (P5/P6) header: (magic, w, h, maxval, data_offset)."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        return None
    magic = payload[:2].decode()
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(payload) or not payload[i : i + 1].isspace():
        return None
    w, h, maxval = fields
    return magic, w, h, maxval, i + 1  # single whitespace after maxval


def decode_image(payload: bytes):
    """Decode PGM/PPM/uncompressed-24-bit-BMP bytes → uint8 ndarray
    (H×W for gray, H×W×3 for color), or None if the format is not one of
    the pure-numpy-decodable set."""
    import numpy as np

    if not payload:
        return None
    hdr = _pnm_header(bytes(payload))
    if hdr is not None:
        magic, w, h, maxval, off = hdr
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        ch = 1 if magic == "P5" else 3
        need = w * h * ch
        if len(payload) < off + need:
            return None
        data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
        return data.reshape((h, w) if ch == 1 else (h, w, 3)).copy()
    if payload[:2] == b"BM" and len(payload) >= 54:
        import struct

        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        flipped = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        need = data_off + stride * h
        if len(payload) < need:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return (img[::-1] if flipped else img).copy()
    return None


def encode_pnm(img) -> bytes:
    """uint8 ndarray (H×W or H×W×3) → PGM/PPM bytes."""
    h, w = img.shape[:2]
    magic = b"P5" if img.ndim == 2 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def resample_nearest(img, out_w: int, out_h: int):
    """Deterministic nearest-neighbor resample: source index
    floor((i + 0.5) · src/dst) — the classic center-aligned mapping, exact
    in integer arithmetic ((2i+1)·src // (2·dst)) so every engine and the
    SQL oracle agree on WHICH pixels survive."""
    h, w = img.shape[:2]
    rows = [((2 * r + 1) * h) // (2 * out_h) for r in range(out_h)]
    cols = [((2 * c + 1) * w) // (2 * out_w) for c in range(out_w)]
    return img[rows][:, cols]


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
    metadata math); the pixel resample is REAL for the pure-numpy codec
    set (PGM/PPM/BMP → decode, nearest-neighbor resample, PNM re-encode,
    status ``resized``); other formats pass through with the stub marker
    exactly where a pillow call would slot in. Rows with no dimensions
    (audio/text) pass through unresized. MAP-ONLY.

    target = floor(dim · s) with s = min(max_w/w, max_h/h, 1) — computed as
    integer cross-multiplication (w·max_h ≷ h·max_w picks the binding
    side) so both engines and any future SQL twin agree exactly.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, statuses = [], []
            for p, t, tw, th in zip(
                pdf["payload"], pdf["media_type"], pdf["target_w"], pdf["target_h"]
            ):
                img = decode_image(p) if t == "image" else None
                if img is not None and tw and th and tw > 0 and th > 0:
                    if (img.shape[1], img.shape[0]) != (int(tw), int(th)):
                        img = resample_nearest(img, int(tw), int(th))
                    payloads.append(encode_pnm(img))
                    statuses.append("resized")
                else:
                    payloads.append(p)
                    statuses.append(decode_stub(p, t))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": pdf["target_w"],
                    "target_h": pdf["target_h"],
                    "payload": payloads,
                    "decode_status": statuses,
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
