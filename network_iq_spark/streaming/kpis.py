"""Structured Streaming tier (SURVEY.md §2.10 / §7 phase E).

The reference has no streaming path — but its telemetry table is naturally a
stream (event-time = timestamp), and every grouped-by-hour batch operator has
a direct tumbling-window analogue:

- A4/A5/A9 grouped aggregates → ``groupBy(window(ts, "1 hour"), keys)`` with
  a watermark bounding state.
- W2 trailing features → sliding windows (``window(ts, "3 hours", "1 hour")``).
- P12 latest-per-key snapshot → arbitrary stateful dedup
  (``applyInPandasWithState`` — the flatMapGroupsWithState analogue).

Late data policy: rows later than the watermark are dropped from their
window — at 100 TB the watermark bound is what keeps state finite; the
delta/append sink records window finalization, so downstream readers see
only closed windows in append mode.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def read_telemetry_stream(
    spark: SparkSession,
    path: str | None = None,
    schema: StructType | None = None,
    fmt: str = "parquet",
    source: str = "file",
    options: dict | None = None,
) -> DataFrame:
    """Telemetry stream behind a SOURCE seam — the downstream operators
    (tumbling/sliding KPIs, sessionize, dedup, joins) never know where the
    rows came from:

    - ``file`` (default): stream over the same at-rest layout the batch
      tier scans — one pipeline definition serves both (Kappa posture).
    - ``rate``: the built-in deterministic-content generator (consecutive
      ``value`` counters) — compose with :func:`telemetry_from_rate` to get
      typed telemetry rows; used by the rate-source equivalence tests.
    - ``kafka``: the production bus — bootstrap/topic via ``options``
      (``kafka.bootstrap.servers``, ``subscribe``, ``startingOffsets``);
      value bytes decode through :func:`decode_kafka_telemetry`, which is
      also unit-testable on a static frame with Kafka's wire schema.
      Requires the spark-sql-kafka connector on the classpath (not in this
      container — load() raises; the decode path carries the test burden).
    """
    opts = dict(options or {})
    if source == "file":
        reader = spark.readStream.format(fmt).schema(schema)
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load(path)
    if source == "rate":
        reader = spark.readStream.format("rate")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
    if source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return decode_kafka_telemetry(reader.load(), schema)
    raise ValueError(f"unknown stream source {source!r} (file|rate|kafka)")


def decode_kafka_telemetry(raw: DataFrame, schema: StructType) -> DataFrame:
    """Kafka wire frame (key/value binary, topic, partition, offset,
    timestamp) → typed telemetry columns: JSON value parsed against
    ``schema``. Pure column expressions — identical on a static frame, so
    the decode is testable without a broker."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def telemetry_from_rate(rate_df: DataFrame, epoch: str = "2025-01-01 00:00:00",
                        n_cells: int = 4) -> DataFrame:
    """Deterministic telemetry rows from the rate source's ``value``
    counter (pure column expressions — apply the same transform to
    ``spark.range`` for the batch twin): event time advances one second
    per row from ``epoch``, cells round-robin, latency is an exact
    integer-valued function of the counter. Content depends only on WHICH
    counters a trigger consumed (always a contiguous prefix), never on
    wall-clock — what makes rate-source equivalence tests exact."""
    v = F.col("value")
    return rate_df.select(
        (F.to_timestamp(F.lit(epoch)) + F.make_interval(secs=v)).alias("timestamp"),
        F.concat(F.lit("CELL-"), (v % n_cells).cast("string")).alias("cell_id"),
        (20 + (v % 50)).cast("double").alias("latency_ms"),
        v.alias("value"),
    )


def tumbling_kpis(
    stream: DataFrame,
    ts_col: str = "timestamp",
    keys: Sequence[str] = (),
    metric: str = "latency_ms",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hourly KPI aggregates as a watermarked tumbling-window stream
    (the streaming twin of A4/A5)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(
            F.avg(metric).alias("avg_value"),
            F.stddev_samp(metric).alias("std_value"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "avg_value",
            "std_value",
            "n",
        )
    )


def sliding_features(
    stream: DataFrame,
    ts_col: str = "timestamp",
    keys: Sequence[str] = ("cell_id",),
    metric: str = "latency_ms",
    window: str = "3 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
) -> DataFrame:
    """Trailing 3 h rolling features (W2's streaming analogue): each hourly
    slide emits the mean/std of the last 3 h per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), *keys)
        .agg(
            F.avg(metric).alias("rmean"),
            F.coalesce(F.stddev_samp(metric), F.lit(0.0)).alias("rstd"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("window.end").alias("feature_ts"),
            *keys,
            "rmean",
            "rstd",
            "n",
        )
    )


def sliding_distinct_keys(
    stream: DataFrame,
    ts_col: str = "timestamp",
    distinct_col: str = "cell_id",
    window: str = "3 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct-cardinality per sliding window as an HLL++ sketch
    (``approx_count_distinct``) — exact COUNT(DISTINCT) is unsupported in
    streaming aggregations for a reason: its state is the value set itself.
    The sketch is mergeable and register-maxing, so state per window is a
    fixed few KB, results are independent of arrival order/micro-batching,
    and the batch replay of the same data produces the IDENTICAL estimate
    (equivalence-tested) — the same exact/approx duality the batch tier
    documents for percentile vs percentile_approx."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide))
        .agg(
            F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "approx_distinct",
            "n_rows",
        )
    )


def latest_per_key(
    stream: DataFrame,
    schema_ddl: str,
    ts_col: str = "timestamp",
    key: str = "cell_id",
    value_cols: Sequence[str] = ("latency_ms", "throughput_mbps"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful latest-row-per-key (P12/W6 streaming twin) via
    ``applyInPandasWithState``: state holds one (ts, values) tuple per key,
    updated when a newer event arrives. State size = O(#keys), bounded.

    ``schema_ddl`` example: ``"cell_id string, ts timestamp, latency_ms
    double, throughput_mbps double"``.
    """
    cols = [key, ts_col, *value_cols]

    def update(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        newest: tuple | None = state.get if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            last = pdf.iloc[-1]
            cand = tuple(last[c] for c in cols)
            if newest is None or cand[1] > newest[1]:
                newest = cand
        if newest is not None:
            state.update(newest)
            yield pd.DataFrame([dict(zip(cols, newest))])

    return (
        stream.withWatermark(ts_col, watermark)
        .select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=schema_ddl,
            stateStructType=schema_ddl,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
