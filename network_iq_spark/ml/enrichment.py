"""LLM enrichment (SURVEY.md §2.9 M7) — the reference's AI-briefing path
(``_ai_call`` + cached wrappers + run guard, streamlit_app.py:1166-1272)
re-expressed for an engine:

- The **context** is a lazy 1-row plan (``plans.briefing_context``) carrying
  its own sha-256 content hash (F13).
- The **cache** is a parquet table keyed by that hash with a TTL — the
  durable twin of ``st.cache_data(ttl=600)``.
- The **run guard** caps LLM calls per enricher instance (reference: ≤10 per
  session).
- Batch per-key enrichment uses ``mapInPandas`` so one Python worker batches
  many API calls (rate-limited) — the scale pattern for millions of rows.

No LLM SDK ships in this container: the provider callable is injected; the
default mirrors the reference's "_AI disabled_" degradation.
"""

from __future__ import annotations

import datetime
import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LlmFn = Callable[[str, str], str]  # (system_msg, user_json) -> markdown

BRIEFING_SYSTEM_MSG = (
    "You are a senior telecom reliability analyst. Write a concise briefing "
    "using ONLY provided data. Sections: 1) Executive Summary (<=4 bullets), "
    "2) Key Drivers, 3) At-Risk Cells, 4) Recommended Actions, 5) Caveats."
)


def disabled_llm(system_msg: str, user_json: str) -> str:
    """Reference-style graceful degradation when no provider is configured."""
    return "_AI disabled: no provider configured._"


class Enricher:
    """Driver-side enrichment with a hash-keyed parquet cache and run guard."""

    def __init__(
        self,
        spark: SparkSession,
        cache_path: str,
        llm: LlmFn = disabled_llm,
        ttl_seconds: int = 600,
        max_runs: int = 10,
    ) -> None:
        self.spark = spark
        self.cache_path = cache_path
        self.llm = llm
        self.ttl_seconds = ttl_seconds
        self.max_runs = max_runs
        self.runs = 0

    def _cache_lookup(self, key: str) -> str | None:
        if not os.path.exists(self.cache_path):
            return None
        cutoff = time.time() - self.ttl_seconds
        hit = (
            self.spark.read.parquet(self.cache_path)
            .filter((F.col("context_hash") == key) & (F.col("created_at") >= cutoff))
            .orderBy(F.col("created_at").desc())
            .limit(1)
            .collect()
        )
        return hit[0].briefing if hit else None

    def _cache_put(self, key: str, briefing: str) -> None:
        row = [(key, briefing, time.time(), datetime.datetime.utcnow().isoformat())]
        self.spark.createDataFrame(
            row, "context_hash string, briefing string, created_at double, created_iso string"
        ).write.mode("append").parquet(self.cache_path)

    def briefing(self, context: DataFrame, system_msg: str = BRIEFING_SYSTEM_MSG) -> str:
        """Run (or fetch) the briefing for a 1-row context plan with
        (context_json, context_hash) columns."""
        row = context.limit(1).collect()[0]
        cached = self._cache_lookup(row.context_hash)
        if cached is not None:
            return cached
        if self.runs >= self.max_runs:
            return "_AI run limit reached for this session._"
        self.runs += 1
        out = self.llm(system_msg, row.context_json)
        self._cache_put(row.context_hash, out)
        return out


def enrich_batch(
    df: DataFrame,
    llm: LlmFn,
    system_msg: str,
    json_col: str = "context_json",
    out_col: str = "briefing",
    calls_per_second: float = 5.0,
) -> DataFrame:
    """Per-row LLM enrichment at scale: ``mapInPandas`` batches rows into one
    Python worker per partition, throttled to ``calls_per_second`` — the
    pattern for enriching millions of keys without per-row UDF overhead.
    Partition count bounds concurrency (repartition upstream to set the
    aggregate rate)."""
    from pyspark.sql.types import StringType, StructField, StructType

    # copy — StructType.add MUTATES the DataFrame's own schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType())]
    )
    min_interval = 1.0 / calls_per_second if calls_per_second > 0 else 0.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last = 0.0
        for pdf in batches:
            results = []
            for payload in pdf[json_col]:
                wait = min_interval - (time.monotonic() - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                results.append(llm(system_msg, payload))
            pdf[out_col] = results
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
