"""Relational-core queries (SURVEY.md §2.4/§2.6 over the star schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from network_iq_spark.functions import sql_davg as _davg
from network_iq_spark.functions import sql_dsum as _dsum
from network_iq_spark.operators.aggregates import pricing_summary
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table


@register(
    "pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {_dsum('l_quantity')}                                           AS sum_qty,
      {_dsum('l_extendedprice')}                                      AS sum_base_price,
      {_dsum('l_extendedprice * (1 - l_discount)')}                   AS sum_disc_price,
      {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}  AS sum_charge,
      {_davg('l_quantity')}                                           AS avg_qty,
      {_davg('l_extendedprice')}                                      AS avg_price,
      {_davg('l_discount', 6)}                                        AS avg_disc,
      COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: grouped multi-agg pricing summary (A5 writ large)."""
    return pricing_summary(load_table(spark, sf_dir, "lineitem"))
