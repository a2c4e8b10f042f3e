"""Streaming dedup — the Structured Streaming sibling of the batch dedup
tier (operators/dedup.py exact_dedup / windows.py dedup-keep-last).

Two shapes, both state-bounded by a watermark (the property that keeps a
100 TB/day stream's dedup state finite):

- **Exact arrival dedup** (``streaming_exact_dedup``):
  ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per key and
  drops any duplicate that arrives within the watermark delay of it. This
  is the ingestion-time contract a training-data firehose needs (at-least-
  once upstream delivery → exactly-once content downstream); duplicates
  separated by more than the watermark are the batch tier's job (the
  nightly exact_dedup pass over the at-rest table), which is the standard
  lambda split for dedup state that cannot live in memory forever.

- **Keep-last snapshot** (``kpis.latest_per_key``): update-mode stateful
  op already in the tier (W6/P12 analogue).

The fingerprint column uses the SAME md5 normalization as the batch
``text.fingerprint`` operator, so a row deduped in-stream hashes identically
to one deduped at rest — stream and batch agree on what "duplicate" means.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """md5 over whitespace-normalized lowercase text — identical to the
    batch ``operators.text.fingerprint`` key, usable on a stream (pure
    map, no state)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def streaming_exact_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins exact dedup over a stream.

    ``dropDuplicatesWithinWatermark`` stores one state row per key seen
    within the watermark horizon and emits only the first arrival; state
    for a key is evicted once the watermark passes its event time, so
    memory is O(keys per watermark window), not O(stream history).
    """
    return stream.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(keys))
