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
