"""Skew mitigation (SURVEY.md §7 hard-parts: 'grouped rolling features at
scale — skew per cell_id → salting').

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session). These
operators cover the two shapes AQE does not fix:

- **Salted two-phase aggregation** — one hot group key saturating a single
  reducer. Phase 1 aggregates (key, salt) partials across ``n_salts``
  reducers; phase 2 merges partials per key. Works for any
  decomposable/algebraic aggregate (sum, count, min, max, avg via
  sum+count).
- **Salted broadcast-side replication join** — a hot fact key against a
  small dim: replicate each dim row ``n_salts`` times, salt the fact
  randomly-but-deterministically, join on (key, salt). The fact's hot key
  spreads over ``n_salts`` reducers; the dim stays broadcastable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, keys: Sequence[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt (stable across retries — required
    for exactly-once shuffle files): hash of the full row's key cols plus a
    uniform spreader over a monotonic id would break determinism, so spread
    on a cheap hash of all columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregate: per-key sum/count/avg of ``value``.

    Equivalent to ``groupBy(keys).agg(sum, count, avg)`` but no reducer ever
    sees more than ~1/n_salts of a hot key's rows in phase 1.
    """
    salted = df.withColumn("__salt__", _salt(df, keys, n_salts))
    partial = salted.groupBy(*keys, "__salt__").agg(
        F.sum(value).alias("__psum__"),
        F.count(value).alias("__pcnt__"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum__").alias(f"sum_{value}"),
        F.sum("__pcnt__").alias(f"count_{value}"),
        (F.sum("__psum__") / F.sum("__pcnt__")).alias(f"avg_{value}"),
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Hot-key-tolerant fact ⟕ dim: dim rows replicate n_salts times (still
    tiny), fact rows salt deterministically, join on (key, salt)."""
    dim_rep = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    fact_s = fact.withColumn("__salt__", _salt(fact, [key], n_salts))
    return fact_s.join(F.broadcast(dim_rep), [key, "__salt__"], how).drop("__salt__")
