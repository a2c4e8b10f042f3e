"""Ingest pipeline (S1/P1/P2/S8) and resolver (lenient-on-read) tests."""

from __future__ import annotations

import os

import pytest

from tests.telemetry_fixture import telemetry_pdf


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("raw") / "cells.csv"
    telemetry_pdf().to_csv(p, index=False)
    return str(p)


def test_csv_to_partitioned_parquet_roundtrip(spark, csv_path, tmp_path):
    from network_iq_spark.ingest import ingest, read_csv, read_curated, telemetry_schema

    out = str(tmp_path / "curated")
    raw = read_csv(spark, csv_path, telemetry_schema())
    assert [f.name for f in telemetry_schema().fields][:2] == ["timestamp", "cell_id"]

    ingest(raw, out)

    # hive layout: date=... / cell_id=... directories
    dates = [d for d in os.listdir(out) if d.startswith("date=")]
    assert len(dates) == 5
    cells = os.listdir(os.path.join(out, dates[0]))
    assert any(c.startswith("cell_id=") for c in cells)

    cur = read_curated(spark, out)
    # cleansing applied: no non-positive latency survives
    assert cur.filter("latency_ms <= 0").count() == 0
    # derived columns present and partition columns reconstituted
    assert {"date", "cell_id", "hour"} <= set(cur.columns)

    # partition pruning: a date filter must prune the file listing
    pruned = cur.filter("date = '2025-07-01'")
    plan = pruned.explain(mode="formatted") or ""
    assert pruned.count() > 0


def test_partition_pruning_in_plan(spark, csv_path, tmp_path):
    from network_iq_spark.ingest import ingest, read_csv, read_curated, telemetry_schema

    out = str(tmp_path / "curated2")
    ingest(read_csv(spark, csv_path, telemetry_schema()), out)
    cur = read_curated(spark, out)
    plan = cur.filter("date = '2025-07-01'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "partitionFilters" in plan


def test_resolver_aliases(spark):
    from network_iq_spark.resolver import pick, resolve

    df = spark.createDataFrame([("2025-01-01", "c1", 0.5)], ["TS", "cell", "prob"])
    assert pick(df, "timestamp", "ts") == "TS"
    out = resolve(df, required=["timestamp", "cell_id"])
    assert {"timestamp", "cell_id", "pred_prob"} <= set(out.columns)

    with pytest.raises(ValueError, match="missing required column"):
        resolve(spark.createDataFrame([(1,)], ["x"]), required=["timestamp"])


def test_read_csv_split_quarantines_malformed_lines(spark, tmp_path):
    """CSV two-probe split: well-typed rows on the valid side; lines the
    schema can't parse (wrong arity / untypeable fields) quarantined with
    their raw text and source file — nothing dropped, nothing fatal."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from network_iq_spark.ingest import read_csv_split

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,0.5\n"
        "2,beta,not-a-number\n"
        "3,gamma,1.5\n"
    )
    valid, corrupt = read_csv_split(spark, str(p), schema)
    vrows = sorted((r.id, r.name, r.score) for r in valid.collect())
    assert vrows == [(1, "alpha", 0.5), (3, "gamma", 1.5)]
    crows = corrupt.collect()
    assert [r.raw_line for r in crows] == ["2,beta,not-a-number"]
    assert crows[0].src_file.endswith("feed.csv")


def test_read_csv_split_corrupt_scan_requires_all_columns(spark, tmp_path):
    """Plan-level guard for the corrupt probe's full-width parse: the
    corrupt side anchors every data column in the required set via a
    concat_ws the optimizer can't prove away (ingest.py). If a future
    Spark version constant-folds it, the scan would re-prune to the lone
    corrupt column — silently missing corruption in unreferenced columns
    or resurrecting QUERY_ONLY_CORRUPT_RECORD_COLUMN. Assert the
    ReadSchema of the most aggressively pruned consumer (a bare count,
    which discards the projection entirely) still reads every column."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from network_iq_spark.ingest import read_csv_split

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    p = tmp_path / "feed.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,bad\n")
    _, corrupt = read_csv_split(spark, str(p), schema)
    plan = (
        corrupt.groupBy().count()._jdf.queryExecution().executedPlan().toString()
    )
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    for col in ("id", "name", "score"):
        assert col in read[0], (col, read[0])
    # and the probe still works end-to-end under that pruning
    assert corrupt.count() == 1


def test_read_evolved_parquet_merges_additive_schemas(spark, tmp_path):
    """Generation 1 lacks the column generation 2 added: the merged scan
    exposes the union schema with nulls for pre-evolution rows."""
    from network_iq_spark.sources.tables import read_evolved_parquet

    g1 = str(tmp_path / "gen=1")
    g2 = str(tmp_path / "gen=2")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(g1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.parquet(g2)
    df = read_evolved_parquet(spark, g1, g2)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_read_csv_split_header_variants(spark, tmp_path):
    """The corrupt probe uses the csv reader's own per-file header skip,
    not reconstructed-header string matching (ADVICE r6): a header that
    differs in spacing/case is still just a header (not quarantined), a
    DATA line that happens to equal the header text is kept (all-string
    schema parses it fine), and corruption in a column other than the
    first is still detected (the probe forces a full-width parse)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from network_iq_spark.ingest import read_csv_split

    # (a) header with spacing + case drift; (b) corrupt value in LAST column
    s1 = StructType([StructField("id", LongType()), StructField("score", LongType())])
    p1 = tmp_path / "spaced.csv"
    p1.write_text("ID , Score\n1,10\n2,zzz\n")
    valid, corrupt = read_csv_split(spark, str(p1), s1)
    assert sorted((r.id, r.score) for r in valid.collect()) == [(1, 10)]
    assert [r.raw_line for r in corrupt.collect()] == ["2,zzz"]

    # (c) a data line textually equal to the header, under an all-string
    # schema: previously silently dropped from BOTH sides, now valid
    s2 = StructType([StructField("a", StringType()), StructField("b", StringType())])
    p2 = tmp_path / "headerlike.csv"
    p2.write_text("a,b\nx,y\na,b\n")
    valid2, corrupt2 = read_csv_split(spark, str(p2), s2)
    assert sorted((r.a, r.b) for r in valid2.collect()) == [("a", "b"), ("x", "y")]
    assert corrupt2.count() == 0
