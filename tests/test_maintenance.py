"""Compaction must reduce file counts without changing data, and clustering
must produce selective row-group stats."""

from __future__ import annotations

from tests.telemetry_fixture import telemetry_pdf


def test_compact_and_cluster(spark, tmp_path):
    from network_iq_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "frag")
    df = spark.createDataFrame(telemetry_pdf())
    # fragment: 16 small files
    df.repartition(16).write.parquet(path)
    checksum = df.count(), df.agg({"latency_ms": "sum"}).collect()[0][0]

    before, after = compact_parquet_dir(
        spark, path, target_files=2, cluster_by=["cell_id", "timestamp"]
    )
    assert before == 16 and after == 2

    import pytest

    back = spark.read.parquet(path)
    assert back.count() == checksum[0]
    # float sum is order-dependent across layouts — approx equality
    assert back.agg({"latency_ms": "sum"}).collect()[0][0] == pytest.approx(
        checksum[1], rel=1e-12
    )

    # clustering makes per-file cell_id ranges narrow: check parquet
    # row-group stats via duckdb metadata
    import duckdb

    stats = duckdb.connect().execute(
        f"SELECT stats_min_value, stats_max_value FROM parquet_metadata('{path}/*.parquet') "
        "WHERE path_in_schema = 'cell_id'"
    ).fetchall()
    assert stats
    # range clustering ⇒ every row group covers a narrow key range; none
    # spans the full CELL-001..005 domain (hash layout would)
    assert all((mn, mx) != ("CELL-001", "CELL-005") for mn, mx in stats)


def test_upsert_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from network_iq_spark.sources.maintenance import upsert_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
         (3, "2024-01-02", 30.0), (4, "2024-01-03", 40.0)],
        "id bigint, day string, v double",
    )
    base.write.partitionBy("day").parquet(path)

    updates = spark.createDataFrame(
        [(2, "2024-01-01", 99.0),          # replaces existing key
         (5, "2024-01-02", 50.0)],         # new key, existing partition
        "id bigint, day string, v double",
    )
    n = upsert_partitioned(spark, path, updates, keys=["id"], partition_cols=["day"])
    assert n == 2  # two partitions touched

    got = {(r.id, str(r.day)): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "2024-01-01"): 10.0,
        (2, "2024-01-01"): 99.0,   # updated
        (3, "2024-01-02"): 30.0,
        (5, "2024-01-02"): 50.0,   # inserted
        (4, "2024-01-03"): 40.0,   # untouched partition intact
    }

    # idempotence: re-applying the same updates changes nothing
    upsert_partitioned(spark, path, updates, keys=["id"], partition_cols=["day"])
    again = {(r.id, str(r.day)): r.v for r in spark.read.parquet(path).collect()}
    assert again == got

    # untouched-partition files must not be rewritten
    import os
    mtimes_before = {}
    for root, _, files in os.walk(os.path.join(path, "day=2024-01-03")):
        for f in files:
            mtimes_before[f] = os.path.getmtime(os.path.join(root, f))
    upsert_partitioned(
        spark, path,
        spark.createDataFrame([(6, "2024-01-01", 1.0)], "id bigint, day string, v double"),
        keys=["id"], partition_cols=["day"],
    )
    for root, _, files in os.walk(os.path.join(path, "day=2024-01-03")):
        for f in files:
            assert os.path.getmtime(os.path.join(root, f)) == mtimes_before[f]
