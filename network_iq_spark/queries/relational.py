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


@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY priority, status
    """,
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization rollup/cube sugar over):
    per-priority totals, per-status totals, and the grand total in ONE
    pass — Spark expands the sets and shares the scan; the alternative is
    three scans + a union. Null group labels are COALESCEd to 'ALL' so
    both engines agree without grouping-id comparisons; sums ride the
    integer-unit path."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    from network_iq_spark.functions import sql_dsum

    # Spark SQL shares DuckDB's GROUPING SETS syntax; the dsum twin keeps
    # the double bit-identical under any partitioning
    return spark.sql(f"""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 2)} AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY priority, status
    """)
