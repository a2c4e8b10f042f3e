"""Shared SQL-fragment builders for DuckDB oracle strings.

Mirrors ``network_iq_spark.functions`` determinism helpers. Cross-engine
float rules used throughout the registry (each violated rule = a flaky
oracle):

1. Float SUM/AVG is order-dependent → sum ROUND()ed values as DECIMAL
   (``dsum``/``davg``) or, for *window* aggregates, sum integer cents —
   DuckDB evaluates bounded window frames with segment trees whose float
   association differs from Spark's, so only integer/decimal window sums are
   safe.
2. ``round(double)`` itself is NOT cross-engine deterministic for arbitrary
   doubles (different tie algorithms); it IS safe when the value's intrinsic
   decimal scale ≤ the round scale (round is then exact-value recovery).
3. Derived row-level floats (z-scores, norms) are deterministic iff every
   input is bit-identical and both engines evaluate the same expression
   tree — build means/stds from integer/decimal sums with explicitly
   identical formulas on both sides.
"""

from __future__ import annotations

from network_iq_spark.functions import sql_davg as davg  # noqa: F401
from network_iq_spark.functions import sql_dsum as dsum  # noqa: F401


def cents(expr: str) -> str:
    """Exact integer representation of a 2-decimal double (floor(+0.5) is
    the same fast exact-recovery trick as dsum, scale 2)."""
    return f"CAST(FLOOR({expr} * 100 + 0.5) AS BIGINT)"


def mean_from_cents(s1: str, n: str) -> str:
    """mean = Σcents / (100·n), written identically in Spark & SQL."""
    return f"({s1} / (100.0 * {n}))"


def std_from_cents(s1: str, s2: str, n: str) -> str:
    """Sample std (ddof=1) from integer sums:
    var = (Σc²/10⁴ − (Σc/100)²/n) / (n−1), guarded ≥ 0.

    The FORMULA TEXT here is the contract — the Spark side must build the
    exact same expression tree (see ``queries.telemetry._std_from_cents``).
    """
    return (
        f"SQRT(GREATEST(0.0, "
        f"(({s2} / 10000.0) - (({s1} / 100.0) * ({s1} / 100.0)) / {n}) / ({n} - 1)"
        f"))"
    )
