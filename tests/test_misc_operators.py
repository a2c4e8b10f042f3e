"""Coverage for the remaining §2 odds and ends: grouped-map escape hatch
(W4), ensure_columns (U4), cloud path helpers (S11), contract gate (Q2)."""

from __future__ import annotations

import pandas as pd


def test_grouped_map_escape_hatch(spark):
    """W4: applyInPandas per-group logic — per-group mean-centering, the
    reference's groupby.apply shape (streamlit_app.py:709)."""
    from network_iq_spark.operators.windows import grouped_map

    df = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, 10.0), (2, 30.0)], "id long, v double"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = grouped_map(df, ["id"], center, "id long, v double").collect()
    got = sorted((r.id, r.v) for r in out)
    assert got == [(1, -1.0), (1, 1.0), (2, -10.0), (2, 10.0)]


def test_ensure_columns(spark):
    """U4: missing required columns appear as typed nulls; existing ones
    are untouched."""
    from network_iq_spark.operators.reshape import ensure_columns

    df = spark.createDataFrame([(1.0,)], "a double")
    out = ensure_columns(df, ["a", "b", "c"])
    assert set(out.columns) == {"a", "b", "c"}
    row = out.collect()[0]
    assert row.a == 1.0 and row.b is None and row.c is None


def test_cloud_path_helpers(monkeypatch):
    from network_iq_spark.sources.cloud import (
        env_source_path,
        normalize_cloud_path,
        s3a_conf,
    )

    assert normalize_cloud_path("s3://bucket/key") == "s3a://bucket/key"
    assert normalize_cloud_path("/local/path") == "/local/path"
    monkeypatch.setenv("NETWORKIQ_S3_PATH", "s3://b/raw.csv")
    assert env_source_path() == "s3a://b/raw.csv"
    monkeypatch.delenv("NETWORKIQ_S3_PATH")
    assert env_source_path() is None
    conf = s3a_conf(endpoint="http://minio:9000")
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert "spark.hadoop.fs.s3a.access.key" not in conf


def test_contract_gate(spark):
    """Q2: pass/fail over the Q1 summary row (streamlit_app.py:98-105)."""
    from network_iq_spark.operators.quality import (
        Contract,
        contract_passed,
        contract_summary,
    )

    clean = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    c = Contract(required=("id", "v"), not_null=("id", "v"), ranges={"v": (0, 10)})
    row = contract_summary(clean, c).collect()[0].asDict()
    assert contract_passed(row)

    dirty = spark.createDataFrame([(1, 50.0), (2, None)], "id long, v double")
    row = contract_summary(dirty, c).collect()[0].asDict()
    assert not contract_passed(row)
