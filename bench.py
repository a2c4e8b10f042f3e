#!/usr/bin/env python
"""BENCH harness: run the headline queries at $SPARK_GRAFT_SF_DIR and print
one JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Per-query timing = full plan execution to a count-style action (results are
consumed, never collected to the driver in bulk). A warmup pass absorbs JVM
startup and codegen so the numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: one per operator family, kept fast enough for per-round CI.
# Falls back to "every registered query" when BENCH_ALL=1.
HEADLINE = [
    "pricing_summary",
]


def main() -> None:
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="network-iq-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    names = sorted(QUERIES) if os.environ.get("BENCH_ALL") else [
        n for n in HEADLINE if n in QUERIES
    ]

    # warmup: touch every table + run the first query once
    for n in names[:1]:
        QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "operator_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
