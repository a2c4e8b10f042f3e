"""Single-pass pipeline telemetry via Spark's Observation API.

A multi-stage cascade (quality filter → dedup → near-dup → split) needs
per-stage row counts and drop rates for monitoring — but calling
``.count()`` per stage re-executes the upstream plan once per metric, and
the counts can drift between executions on changing input. ``observe``
attaches accumulator-backed aggregates to a point IN the plan: every metric
is collected during the ONE action that materializes the result, exactly
consistent with the rows that action saw. This is the Spark-idiomatic
replacement for the reference's eager ``len(df)`` checkpoints
(streamlit_app.py sprinkles them between pandas stages for free — lazy
engines have to ask for them explicitly).

At 100 TB: zero extra jobs, zero extra scans — metrics ride the shuffle
files the action already writes. The only contract is that metrics are
available AFTER the action completes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


class StageMetrics:
    """Collects named per-stage observations over one lazy pipeline.

    Usage::

        sm = StageMetrics()
        df = sm.stage(df, "raw")
        df = sm.stage(df.filter(...), "quality")
        df.write...            # ONE action
        sm.results()           # {"raw": {"rows": ...}, "quality": {...}}
    """

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def stage(self, df: DataFrame, name: str, *extra) -> DataFrame:
        """Attach an observation point: row count plus any extra aggregate
        Columns (must be Observation-legal: no distinct, deterministic)."""
        if name in self._obs:
            raise ValueError(f"duplicate stage name {name!r}")
        obs = Observation(name)
        self._obs[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra)

    def results(self) -> dict[str, dict]:
        """Metrics per stage — call only after an action has run."""
        return {name: dict(obs.get) for name, obs in self._obs.items()}

    def drop_report(self) -> list[tuple[str, int, float]]:
        """(stage, rows, fraction-of-first-stage) in attachment order."""
        out = []
        first: int | None = None
        for name, obs in self._obs.items():
            rows = int(obs.get["rows"])
            if first is None:
                first = rows or 1
            out.append((name, rows, rows / first))
        return out
