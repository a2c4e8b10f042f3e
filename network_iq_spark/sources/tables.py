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
    """Lazy parquet scan of one catalog table under ``sf_dir``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All catalog tables as lazy DataFrames (no I/O until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
