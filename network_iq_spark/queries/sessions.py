"""Sessionization + pivot — the remaining classic analytics shapes.

Sessionization (gap-based session ids) is the canonical event-stream
operator: a new session starts when the per-user gap exceeds the timeout.
Batch formulation = flag + running sum over a per-key window (one shuffle);
the streaming twin is ``groupBy(session_window(ts, gap))`` in Structured
Streaming. All outputs are integer micros/counts — engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from network_iq_spark.registry import register
from network_iq_spark.sources import load_table

SESSION_GAP_MIN = 30


@register(
    "sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                  > {SESSION_GAP_MIN} * 60 * 1000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0
             AS duration_sec
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min timeout): flag session starts via
    lag, running-sum them into session ids, aggregate per session."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "ts",
        "value",
        F.sum(new_session).over(run).cast("bigint").alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1000000.0)
        ).alias("duration_sec"),
    )


_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "hourly_type_pivot",
    oracle="""
    SELECT hour(ts) AS hour,
      {cols}
    FROM events GROUP BY hour(ts) ORDER BY hour
    """.format(
        cols=",\n      ".join(
            f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
            for t in _TYPES
        )
    ),
)
def q_hourly_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide crosstab — survey §2.7 lists it absent-but-free): event
    counts per hour × type. Explicit pivot values keep the schema static
    (no extra distinct-scan job, required for a lazy plan at scale)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.hour("ts"))
        .groupBy("hour")
        .pivot("event_type", list(_TYPES))
        .count()
        .na.fill(0, subset=list(_TYPES))
        .orderBy("hour")
    )
