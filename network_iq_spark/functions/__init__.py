"""Scalar & aggregation helper expressions (SURVEY.md §2.8).

Two concerns live here:

1. **Reference scalar semantics** re-expressed as Column expressions —
   clip (F6), zero-replace guard (F7), fill-null (F8), weekend flag (W8 with
   the pandas-Mon=0 vs Spark-Sun=1 mapping), coerce-or-null casts (P7).

2. **Cross-engine deterministic aggregates** for the correctness oracle.
   Floating-point SUM/AVG are order-dependent; Spark and DuckDB will disagree
   in the last ulps on different partitionings. ``dsum``/``davg`` round each
   input to a fixed scale and sum as DECIMAL (exact integer arithmetic in both
   engines), then cast back to double — bit-identical results regardless of
   partitioning or visit order, at a precision far beyond test tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic aggregates (oracle-stable across engines & partitionings)
# ---------------------------------------------------------------------------

# DECIMAL(27, s) sums comfortably hold 1e9 rows of 1e12-scale values.
_DEC_PREC = 27


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM: per-row round → exact DECIMAL sum → double.

    SQL oracle twin: ``CAST(SUM(CAST(ROUND(x, s) AS DECIMAL(27,s))) AS DOUBLE)``
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c, scale).cast(f"decimal({_DEC_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG built from ``dsum`` / count (both exact).

    SQL oracle twin:
    ``CAST(SUM(CAST(ROUND(x,s) AS DECIMAL(27,s))) AS DOUBLE) / COUNT(x)``
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST(ROUND({expr}, {scale}) AS DECIMAL({_DEC_PREC},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


# ---------------------------------------------------------------------------
# Reference scalar semantics (streamlit_app.py sites cited per function)
# ---------------------------------------------------------------------------


def clip01(col: Column | str) -> Column:
    """``Series.clip(0, 1)`` (streamlit_app.py:996) → least/greatest."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))


def zero_guard(col: Column | str, eps: float = 1e-9) -> Column:
    """``Series.replace(0, 1e-9)`` (streamlit_app.py:540,608,691).

    Semantic requirement of the z-score operators, not an optimization: a
    zero std must become ``eps`` so the division stays finite.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == 0, F.lit(eps)).otherwise(c)


def fill0(col: Column | str) -> Column:
    """``Series.fillna(0)`` (streamlit_app.py:700-701,829)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0.0))


def is_weekend(ts: Column | str) -> Column:
    """pandas ``dt.dayofweek >= 5`` (Mon=0 ⇒ Sat/Sun) ⇢ Spark ``dayofweek``
    (Sun=1 ⇒ weekend ∈ {1, 7}). Site: streamlit_app.py:710-711 (W8 note,
    SURVEY.md §2.5)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.dayofweek(c).isin(1, 7).cast("int")


def coerce_double(col: Column | str) -> Column:
    """``pd.to_numeric(errors="coerce")`` (P7): failed casts yield null even
    under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def coerce_timestamp(col: Column | str) -> Column:
    """``pd.to_datetime(errors="coerce")`` (P7)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp")
