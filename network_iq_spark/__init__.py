"""network_iq_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference telecom-analytics product (pmcavallo/network-iq,
surveyed in SURVEY.md). Every operator is a composable, *lazily planned*
DataFrame transformation: ``(SparkSession | DataFrame, params) -> DataFrame``.
Catalyst owns physical planning (predicate pushdown, column pruning, broadcast
joins, TakeOrderedAndProject top-k, AQE); this package only declares plans.

Layout
------
- ``session``    — SparkSession builder with scale-posture defaults
- ``sources``    — scans/sinks (CSV w/ explicit schema, hive-partitioned parquet)
- ``functions``  — scalar & deterministic-aggregation helpers
- ``operators``  — relational core: filters, aggregates, joins, windows,
                   top-k, reshape, data-quality, dedup, similarity, text
- ``plans``      — end-to-end analytic plans (KPI cards, hourly profile,
                   hotspots, anomalies, incidents) mirroring the reference's
                   dashboard panels (streamlit_app.py) as lazy queries
- ``ml``         — feature builder, scoring (pandas_udf over broadcast model)
- ``streaming``  — Structured Streaming analogues (tumbling KPIs, watermarks)
"""

__version__ = "0.1.0"
