"""Typed-schema parity between every DuckDB oracle and its Spark plan.

The driver's correctness gate hashes TYPED values (arrow-level), so a
DuckDB column typed HUGEINT/decimal128 can never hash-match a Spark
BIGINT even when the values are identical.  The local value-parity
harness (`test_oracle_parity.py`) can't catch this class because
``fetchall()`` normalizes HUGEINT to Python int — it slipped through
twice (r1 `data_contract_events`, r6 `vocab_drift_top_movers`).

This test executes each oracle via ``fetch_arrow_table()`` and compares
the arrow schema, column by column, against the Spark plan's schema
(plan construction only — no Spark execution).  Any DuckDB integer SUM
left uncast in a final projection shows up here as decimal128 vs bigint.
"""

from __future__ import annotations

import os
import re

import duckdb
import pyarrow as pa
import pytest

from network_iq_spark.registry import ORACLES, QUERIES
from network_iq_spark.sources import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _arrow_norm(t: pa.DataType) -> str:
    """Map an arrow type to a Spark-comparable canonical string."""
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/tz/NTZ differences are normalized at scan
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_norm(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_arrow_norm(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_norm(t.key_type)},{_arrow_norm(t.item_type)}>"
    if pa.types.is_integer(t):
        # The driver's compare tolerates integer WIDTH differences (20
        # driver-green queries pair Spark int with DuckDB bigint) but not
        # family differences (decimal128 vs int64 is the r1/r6 failure).
        return "integral"
    return {
        "halffloat": "float",
        "float": "float",
        "double": "double",
        "bool": "boolean",
    }.get(str(t), str(t))


def _spark_norm(t) -> str:
    s = t.simpleString()
    s = s.replace("timestamp_ntz", "timestamp")
    return re.sub(r"\b(tinyint|smallint|bigint|int)\b", "integral", s)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_matches_spark(name, spark, sf_dir, registry_prefetch):
    # schemas come from the session-scoped prefetch (one Spark build + one
    # DuckDB arrow fetch per query per sf_dir — conftest._RegistryPrefetch);
    # the comparison below is unchanged.
    entry = registry_prefetch.entry(sf_dir, name)
    spark_types = {f.name: _spark_norm(f.dataType) for f in entry["schema"].fields}
    duck_types = {f.name: _arrow_norm(f.type) for f in entry["duck_arrow_schema"]}

    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column mismatch {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    diffs = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not diffs, f"{name}: typed-schema drift (spark, duckdb): {diffs}"
