from network_iq_spark.streaming.kpis import (
    latest_per_key,
    read_telemetry_stream,
    sliding_features,
    tumbling_kpis,
)

__all__ = [
    "latest_per_key",
    "read_telemetry_stream",
    "sliding_features",
    "tumbling_kpis",
]
