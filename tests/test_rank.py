"""Scalable global rank/ntile (operators/rank.py) must be result-equivalent
to the single-partition global window it replaces, with a plan that never
funnels the fact table through Exchange SinglePartition."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def people(spark):
    # values with deliberate duplicates (tiebreak column makes the total
    # order) spread over several input partitions
    rows = [(i, float((i * 37) % 101)) for i in range(1013)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "score"])
    ).repartition(7)
    df.persist().count()
    yield df
    df.unpersist()


def test_global_row_number_equivalence(spark, people):
    from network_iq_spark.operators.rank import global_row_number

    want = people.withColumn(
        "rn", F.row_number().over(Window.orderBy("score", "id"))
    )
    got = global_row_number(people, ["score", "id"], out="rn", num_partitions=5)
    w = {(r.id): r.rn for r in want.collect()}
    g = {(r.id): r.rn for r in got.collect()}
    assert w == g


@pytest.mark.parametrize("n", [4, 7, 2000])  # 2000 > N exercises q=0
def test_ntile_scalable_equivalence(spark, people, n):
    from network_iq_spark.operators.rank import ntile_scalable

    want = people.withColumn(
        "bucket", F.ntile(n).over(Window.orderBy("score", "id"))
    )
    got = ntile_scalable(people, n, ["score", "id"], num_partitions=5)
    w = {r.id: r.bucket for r in want.collect()}
    g = {r.id: r.bucket for r in got.collect()}
    assert w == g


def test_no_single_partition_exchange(spark, people):
    """The whole point: the naive global window funnels the DATA through
    Exchange SinglePartition into a Window; the scalable operator plans no
    Window at all, and its only SinglePartition exchanges sit directly over
    (partial) Aggregates — scalar reduces of per-partition counts, never
    rows."""
    from network_iq_spark.operators.rank import ntile_scalable

    naive = people.withColumn(
        "bucket", F.ntile(4).over(Window.orderBy("score", "id"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan and "Window" in naive_plan
    scalable = ntile_scalable(people, 4, ["score", "id"], num_partitions=5)
    lines = scalable._jdf.queryExecution().executedPlan().toString().splitlines()
    assert not any("Window" in ln for ln in lines), "\n".join(lines)
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            assert "Aggregate" in lines[i + 1], "\n".join(lines[i : i + 2])


def test_registered_scalable_quartiles_matches_ntile(spark, sf_dir):
    from network_iq_spark.registry import QUERIES

    a = QUERIES["acctbal_quartiles"](spark, sf_dir).toPandas()
    b = QUERIES["acctbal_quartiles_scalable"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)
