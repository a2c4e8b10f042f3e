"""ORC tier: exact round-trip, hive-partitioned layout with partition
pruning, predicate pushdown reaching the ORC scan, and the parquet→ORC
map-only hop feeding a registered plan unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F

from network_iq_spark.operators.text import token_stats
from network_iq_spark.sources import parquet_to_orc, read_orc, write_orc

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_exact(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    write_orc(src, str(tmp_path / "docs_orc"))
    back = read_orc(spark, str(tmp_path / "docs_orc"))
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_partitioned_layout_prunes_partitions(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    write_orc(src, str(tmp_path / "by_lang"), partition_by=["lang"])
    one = read_orc(spark, str(tmp_path / "by_lang")).filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter handled by the file index, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(lang" in plan
    expected = src.filter(F.col("lang") == "en").count()
    assert one.count() == expected


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    write_orc(src, str(tmp_path / "docs_orc"))
    q = read_orc(spark, str(tmp_path / "docs_orc")).filter(
        F.col("n_chars") > 200
    ).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan.split("PushedFilters")[1][:120]
    # column pruning: the scan reads only the referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


def test_parquet_to_orc_hop_feeds_operators_unchanged(spark, tmp_path):
    orc_docs = parquet_to_orc(
        spark, f"{SF}/documents.parquet", str(tmp_path / "docs_orc")
    )
    via_orc = sorted(map(tuple, token_stats(orc_docs).collect()))
    via_parquet = sorted(
        map(tuple, token_stats(spark.read.parquet(f"{SF}/documents.parquet")).collect())
    )
    assert via_orc == via_parquet
