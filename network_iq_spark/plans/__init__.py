from network_iq_spark.plans.telemetry import (
    anomaly_panel,
    briefing_context,
    build_history_features,
    build_latest_features,
    hotspot_panels,
    hourly_panel,
    incident_panel,
    kpi_panel,
    map_panel,
)

__all__ = [
    "anomaly_panel",
    "briefing_context",
    "build_history_features",
    "build_latest_features",
    "hotspot_panels",
    "hourly_panel",
    "incident_panel",
    "kpi_panel",
    "map_panel",
]
