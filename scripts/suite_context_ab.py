#!/usr/bin/env python
"""Attribution harness for SUITE-CONTEXT inflation (r15, VERDICT r14
item 5 follow-up): replicate bench.py's exact loop shape over a short
query sequence, printing EVERY run (bench prints only the min), so the
inflation's decay shape separates the candidate mechanisms:

- decays within a query's own repeats            -> JIT / first-run
- constant across repeats, gone when run later   -> session-age cost
  (C2 compile storm, cold page cache, lazy init)
- gone with a System.gc() before the query       -> predecessor heap /
  checkpoint-cleanup debt (the ann-family pathology)

  python scripts/suite_context_ab.py [--gc-between] q1 q2 ...
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

    args = sys.argv[1:]
    gc_between = "--gc-between" in args
    names = [a for a in args if not a.startswith("--")]
    runs = int(os.environ.get("CTX_RUNS", "3"))

    spark = get_spark(app_name="suite-context-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmup shape: first query once, untimed
    t0 = time.perf_counter()
    QUERIES[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    print(f"warmup({names[0]}): {time.perf_counter() - t0:.2f}s", flush=True)

    for n in names:
        if gc_between:
            spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"ctx: {n}")
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{n}: min={min(ts):.3f}s  runs=" + " ".join(f"{t:.2f}" for t in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
