from network_iq_spark.plans.telemetry import (
    anomaly_panel,
    build_latest_features,
    hotspot_panels,
    hourly_panel,
    incident_panel,
    kpi_panel,
)

__all__ = [
    "anomaly_panel",
    "build_latest_features",
    "hotspot_panels",
    "hourly_panel",
    "incident_panel",
    "kpi_panel",
]
