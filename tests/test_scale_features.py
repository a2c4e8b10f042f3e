"""Scale features that only show up in plans: bucketed co-located joins
(no exchange) and dynamic partition pruning (scan-time subquery filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.telemetry_fixture import telemetry_pdf


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides of a recurring join on its key removes the
    shuffle entirely (docs/SCALE.md joins section). The warehouse table is
    the price; the exchange-free sort-merge join is the payoff."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pdf = telemetry_pdf()
        df = spark.createDataFrame(pdf)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
        (
            df.select("cell_id", "timestamp", "latency_ms")
            .write.mode("overwrite")
            .bucketBy(4, "cell_id")
            .sortBy("cell_id")
            .saveAsTable("t_bucketed_a")
        )
        (
            df.groupBy("cell_id")
            .agg(F.avg("throughput_mbps").alias("avg_thr"))
            .write.mode("overwrite")
            .bucketBy(4, "cell_id")
            .sortBy("cell_id")
            .saveAsTable("t_bucketed_b")
        )
        joined = spark.table("t_bucketed_a").join(
            spark.table("t_bucketed_b"), "cell_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == len(pdf)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_dynamic_partition_pruning(spark, tmp_path):
    """A join against a filtered dim must prune fact partitions at runtime
    (DPP): the fact scan carries a dynamicpruning subquery on its partition
    column."""
    from network_iq_spark.ingest import ingest, telemetry_schema

    fact_path = str(tmp_path / "fact")
    df = spark.createDataFrame(telemetry_pdf())
    ingest(df, fact_path, partition_cols=("cell_id",))
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("CELL-001", "dallas"), ("CELL-002", "austin")], "cell_id string, city string"
    ).filter(F.col("city") == "dallas")
    joined = fact.join(dim, "cell_id")
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    physical = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in (optimized + physical).lower(), physical
    # one cell's curated rows (ingest cleansing drops dirty fixture rows)
    expected = fact.filter(F.col("cell_id") == "CELL-001").count()
    assert joined.count() == expected > 100


def test_runtime_bloom_filter_join_pruning(spark):
    """The third big join-cost lever next to bucketing and DPP: for a
    shuffle join against a SELECTIVELY FILTERED dim, Spark injects a
    runtime bloom filter built from the dim's join keys into the fact
    side (`might_contain(...)` in the fact scan's filter), pruning fact
    shuffle input before the exchange. At the production defaults this
    fires exactly in the 100 TB regime (application side > 10 GB scan,
    creation side under 10 MB — our sf0.1 fact is below the application
    threshold, so the test lowers it to prove the machinery; the session
    leaves `spark.sql.optimizer.runtime.bloomFilter.enabled` at its
    default ON so production-scale plans get it for free)."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    lid = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = lid.join(dim, lid["l_orderkey"] == orders["o_orderkey"]).groupBy(
            "l_returnflag"
        ).agg(F.count("*").alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan
        # the filter wraps the FACT side's join key, not the dim's
        assert "l_orderkey" in next(
            ln for ln in plan.split("\n") if "might_contain" in ln.lower()
        )
        # and the pruned plan still computes the right answer
        want = sorted(
            map(
                tuple,
                lid.join(
                    dim.select(F.col("o_orderkey").alias("l_orderkey")),
                    "l_orderkey",
                )
                .groupBy("l_returnflag")
                .agg(F.count("*").alias("n"))
                .collect(),
            )
        )
        assert sorted(map(tuple, j.collect())) == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
