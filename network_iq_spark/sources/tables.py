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

    ``events.ts`` has shipped in two physical flavors across testdata
    generations: parquet TIMESTAMP(NANOS) (Spark 4 refuses by default — read
    as raw nanos via ``nanosAsLong`` and narrow with *integer* division;
    nanos exceed 2^53 so float division would corrupt the low bits) and
    parquet TIMESTAMP(MICROS) with ``isAdjustedToUTC=false`` (Spark 4 infers
    TIMESTAMP_NTZ, which ``unix_micros`` et al. reject). Both are normalized
    to classic TIMESTAMP with stored-value-is-UTC-epoch semantics — exactly
    how DuckDB (the correctness oracle) reads the same file — by disabling
    NTZ inference at scan time, with a cast fallback if the conf is pinned.

    Neither flavor is settable per-read (``spark.read.option`` is ignored
    for both — verified empirically), so the two session confs are flipped
    ONLY around the ``spark.read.parquet`` call and restored after: the
    relation snapshots the conf at resolution time, so the returned lazy
    DataFrame keeps the normalized schema while the caller's session state
    is left exactly as found (ADVICE r4: no leaked side effects).
    """
    scan_confs = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    prior = {k: spark.conf.get(k) for k in scan_confs}
    for k, v in scan_confs.items():
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
    for col, dt in df.dtypes:
        if name == "events" and col == "ts" and dt == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dt == "timestamp_ntz":
            # Interpret the naive wall clock as UTC regardless of session tz:
            # shift NTZ into the session zone's wall clock for the same UTC
            # instant, then cast (which applies the session zone) back out.
            df = df.withColumn(
                col,
                F.expr(
                    f"cast(convert_timezone('UTC', current_timezone(), {col})"
                    " as timestamp)"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All catalog tables as lazy DataFrames (no I/O until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def read_evolved_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: union directories written
    at different schema generations (columns added over time) with
    ``mergeSchema`` — rows from generations that predate a column read it
    as null, the lake-standard additive-evolution contract. Column
    RENAMES/retypes are intentionally NOT papered over (they surface as
    new columns / read errors — resolver.py's alias map is the explicit
    tool for renames).

    Scale note: mergeSchema's footer sweep is a one-time planning cost
    proportional to file count (driver-parallelized); pin a merged schema
    with ``.schema(...)`` on hot paths once the layout stabilizes.
    """
    return spark.read.option("mergeSchema", True).parquet(*paths)
