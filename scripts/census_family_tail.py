#!/usr/bin/env python
"""r14 measurements for VERDICT items 5 & 6 in one idle-host session:

(5) census-family suite weight — the r13 verdict asked for a measured
decision before a second resolution query landed; r14 landed five more
family members (two resolutions, three keep-bests) plus trim∘gain, so
measure the WHOLE family back-to-back (min-of-2 each, bench's action)
and total it, as input to the materialize-decode-once decision.

(6) watchlist plateaus — repetition_stats (recorded warm plateau
1.23x floor = ~1.13 s) and minhash_lsh_pairs_prod (warm plateau
1.25x floor = ~1.02 s; documented family first-run warm-up ~10 s):
one solo profile each, compared against the recorded plateau, floors
NOT re-pinned for environment drift.

Run: python scripts/census_family_tail.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FAMILY = [
    "transform_dedup_census",
    "image_transform_resolution",
    "audio_transform_resolution",
    "video_transform_resolution",
    "image_resolution_keep_best",
    "audio_resolution_keep_best",
    "video_resolution_keep_best",
    "audio_trim_gain_pairs",
]
WATCH = {"repetition_stats": 1.13, "minhash_lsh_pairs_prod": 1.02}


def main() -> None:
    import json

    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="census-family-tail")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        la = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        la = None
    print(f"loadavg={la}", file=sys.stderr)

    # one warm-up query to absorb JVM startup (not a family member)
    QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    total = 0.0
    print("| query | min-of-2 (s) |")
    print("|---|---|")
    for n in FAMILY:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[n](spark, SF).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"| `{n}` | {best:.2f} |")
        sys.stdout.flush()
    print(f"| **family total** | **{total:.2f}** |")

    floors = json.load(
        open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_floor.json"))
    )["floors"]
    for n, plateau in WATCH.items():
        prof = []
        for _ in range(5):
            t0 = time.perf_counter()
            QUERIES[n](spark, SF).write.format("noop").mode("overwrite").save()
            prof.append(round(time.perf_counter() - t0, 3))
        f = floors[n]["sec"]
        best = min(prof)
        print(
            f"WATCH {n}: profile={prof} min={best:.3f}s floor={f} "
            f"ratio={best / f:.2f}x recorded_plateau~{plateau}s "
            f"({'HELD' if best <= plateau * 1.15 else 'ESCALATE'})"
        )


if __name__ == "__main__":
    main()
