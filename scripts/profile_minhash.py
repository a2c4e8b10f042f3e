#!/usr/bin/env python
"""Solo steady-state profile for the minhash family (r9 drift root-cause).

Runs each query N times in one session at $SPARK_GRAFT_SF_DIR (default
sf0.1) and prints every timing — first run includes JVM/codegen warmup, the
tail is the steady state. Usage: python scripts/profile_minhash.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "6"))


def main() -> None:
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    names = sys.argv[1:] or ["minhash_lsh_pairs", "minhash_lsh_pairs_prod"]
    spark = get_spark(app_name="minhash-profile")
    spark.sparkContext.setLogLevel("WARN")
    for n in names:
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{n}: {times}  min={min(times)}  steady_min={min(times[1:])}")


if __name__ == "__main__":
    main()
