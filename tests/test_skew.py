"""Salted skew operators must be result-equivalent to their naive twins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", float(i % 7)) for i in range(9000)]
    rows += [(f"k{i % 50}", float(i % 11)) for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "value"]))
    df.persist().count()
    yield df
    df.unpersist()


def test_salted_agg_equals_naive(spark, skewed):
    from network_iq_spark.operators.skew import salted_sum_count

    naive = {
        r.key: (r.s, r.c, r.a)
        for r in skewed.groupBy("key")
        .agg(
            F.sum("value").alias("s"),
            F.count("value").alias("c"),
            F.avg("value").alias("a"),
        )
        .collect()
    }
    salted = {
        r.key: (r.sum_value, r.count_value, r.avg_value)
        for r in salted_sum_count(skewed, ["key"], "value", n_salts=8).collect()
    }
    assert set(naive) == set(salted)
    for k in naive:
        assert salted[k][0] == pytest.approx(naive[k][0])
        assert salted[k][1] == naive[k][1]
        assert salted[k][2] == pytest.approx(naive[k][2])


def test_salted_broadcast_join_equals_naive(spark, skewed):
    from network_iq_spark.operators.skew import salted_broadcast_join

    dim = spark.createDataFrame(
        pd.DataFrame({"key": ["hot"] + [f"k{i}" for i in range(50)],
                      "label": ["H"] + [f"L{i}" for i in range(50)]})
    )
    naive = skewed.join(dim, "key", "left").groupBy("key", "label").count()
    salted = salted_broadcast_join(skewed, dim, "key", n_salts=8).groupBy(
        "key", "label"
    ).count()
    a = {(r.key, r.label): r["count"] for r in naive.collect()}
    b = {(r.key, r.label): r["count"] for r in salted.collect()}
    assert a == b
