"""Set operations / reshaping (SURVEY.md §2.7, U1-U4)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """U1: ``pd.concat(ignore_index=True)`` → unionByName with missing-column
    tolerance (schema-aligned, not positional)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "series",
    value_name: str = "value",
) -> DataFrame:
    """U2: wide → long melt (streamlit_app.py:430)."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def ensure_columns(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """U4: add missing required columns as nulls (``_ensure_cols``,
    streamlit_app.py:627-651 — the index-reset half is meaningless in Spark)."""
    out = df
    for c in required:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("double"))
    return out
