"""Registered driver-facing queries, grouped by SURVEY.md §2 section.

Importing this package registers every query into
``network_iq_spark.registry.QUERIES`` / ``ORACLES``.
"""

from network_iq_spark.queries import llmdata, relational, star, telemetry  # noqa: F401
