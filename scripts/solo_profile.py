#!/usr/bin/env python
"""Solo steady-state profile for registry queries: N repeats of
construct+noop per query on a fresh session, printing every reading and
the min. The grounding tool for suite-reading vs floor disputes.

  SOLO_RUNS=5 python scripts/solo_profile.py video_landmark_pairs ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    runs = int(os.environ.get("SOLO_RUNS", "5"))
    spark = get_spark(app_name="solo-profile")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"solo: {name}")
        ts = []
        for _ in range(runs):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(ts):.3f}s  runs="
            + " ".join(f"{t:.2f}" for t in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
