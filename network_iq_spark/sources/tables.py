"""Table catalog over the driver's parquet testdata.

Mirrors the reference's scan surface (SURVEY.md §2.1): parquet scans with
automatic partition discovery (S2), multi-file/implicit-union scans (S5), and
explicit-schema CSV (S1 — see ``sources/csv.py`` / ``ingest.py``).

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and (for hive layouts) partition pruning — the reference
defeats all three by materializing everything up front
(streamlit_app.py:212-214).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one catalog table under ``sf_dir``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    default — read it as raw nanos (``nanosAsLong``) and convert with
    *integer* division (nanos exceed 2^53, so float division would corrupt
    the low bits). Truncation toward zero matches DuckDB's nanos→micros
    narrowing for the post-epoch data at hand.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All catalog tables as lazy DataFrames (no I/O until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
