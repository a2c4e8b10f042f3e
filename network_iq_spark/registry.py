"""Query registry: the driver-facing catalog of implemented operators.

Each entry pairs a lazy Spark plan builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB. Column names are aliased
identically on both sides (the driver's compare sorts columns by name before
hashing). Aggregates use the deterministic DECIMAL-sum pattern from
``network_iq_spark.functions`` so both engines produce bit-identical doubles
regardless of partitioning.

Registration helper keeps the two dicts in lockstep.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Queries that run in bench.py and the local test suite but are EXCLUDED from
# the driver-facing ``__spark_entry__.queries()`` sheet: float-valued
# approximate structures whose results are legitimate but not SQL-replayable
# (each has an oracle-paired exact or integer-quantized twin that carries the
# correctness burden — see VERDICT r6 item 6).
BENCH_ONLY: set[str] = set()


def register(
    name: str, oracle: str | None = None, bench_only: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bench_only:
            BENCH_ONLY.add(name)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    from network_iq_spark import queries as _q  # noqa: F401


_load_all()
