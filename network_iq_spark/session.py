"""SparkSession factory with the engine's scale-posture defaults.

The reference creates a bare session (``src/ingest/spark_ingest.py:6``). Our
engine pins the configs that matter at 100 TB:

- **AQE on** (runtime re-planning: skew-join splitting, partition coalescing,
  broadcast-join conversion after runtime stats).
- **Arrow on** for any pandas interchange (vectorized batch transfer).
- ``spark.sql.shuffle.partitions`` sized for the local test harness; on a real
  cluster this is the *initial* partition count and AQE coalesces from there.
- Session timezone pinned to UTC so event-time semantics match the columnar
  at-rest representation (tz-naive UTC per reference doc, streamlit_app.py:21)
  and the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Initial shuffle parallelism for the local harness. At cluster scale set this
# to ~2-3x total cores (or rely on AQE coalescing from a high initial value).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "network-iq-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    If a session already exists (e.g. the verification driver owns it), it is
    returned untouched — engine operators never mutate a caller's session.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Silence the 128 MB driver UI etc. for the test harness.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
