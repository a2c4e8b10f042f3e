"""Registered driver-facing queries, grouped by SURVEY.md §2 section.

Importing this package registers every query into
``network_iq_spark.registry.QUERIES`` / ``ORACLES``.
"""

from network_iq_spark.queries import (  # noqa: F401
    extras,
    llmdata,
    pipeline,
    relational,
    scale,
    sessions,
    star,
    telemetry,
)
