#!/usr/bin/env python
"""Growing-HISTORY soak for the r13 incremental trim probe AND sink: a
FIXED 400-clip batch (half head/tail trims of history clips — must be
DROPPED/matched; half fresh — must be admitted/unmatched) against an
at-rest trim_index built from a 1x/3x/10x history. Per-batch cost must
stay flat (token-collision probe, O(batch x collision), never a
history rescan); the dedup/match decision is asserted at every scale,
and sink replays ride the strictly-earlier-batch path.

Run: python scripts/trim_incremental_soak.py   (writes under /tmp;
prints the docs/SCALE.md rows to stdout, per-scale lines to stderr)
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_CLIPS = 2_000
BATCH_CLIPS = 400
ARMS = ((1, 0), (0, 1), (2, 1), (1, 2))


def _clip(seed: int, n: int = 64) -> list[int]:
    h = (hashlib.md5(f"ti{seed}".encode()).digest() * ((n // 16) + 1))[:n]
    return [-32000 + (b * 257) % 64000 for b in h]


def history_rows(mult: int):
    return [(i, _clip(i)) for i in range(BASE_CLIPS * mult)]


def batch_rows():
    rows = []
    for i in range(BATCH_CLIPS):
        mid = 10_000_000 + i
        if i % 2 == 0:  # trim of history clip i -> must be dropped
            head, tail = ARMS[(i // 2) % len(ARMS)]
            rows.append((mid, _clip(i)[head : 64 - tail]))
        else:  # fresh -> must be admitted
            rows.append((mid, _clip(1_000_000 + i)))
    return rows


def _fit(mults, ts):
    xs, ys = [math.log(m) for m in mults], [math.log(t) for t in ts]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )


def main() -> None:
    from network_iq_spark.operators import dedup as D
    from network_iq_spark.session import get_spark
    from network_iq_spark.streaming.dedup import incremental_trim_dedup_sink

    spark = get_spark(app_name="trim-incremental-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    schema = "media_id bigint, s array<int>"
    batch = spark.createDataFrame(batch_rows(), schema).localCheckpoint()
    want_dropped = BATCH_CLIPS // 2

    probe_ts, sink_ts = [], []
    for m in mults:
        hist = spark.createDataFrame(history_rows(m), schema)
        # --- probe: at-rest index materialized outside the timed loop
        toks, seqs = D.trim_index(hist)
        toks, seqs = toks.localCheckpoint(), seqs.localCheckpoint()
        best, matched = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            matched = (
                D.incremental_trimmed_dedup(batch, toks, seqs)
                .select("new_id")
                .distinct()
                .count()
            )
            best = min(best, time.perf_counter() - t0)
        assert matched == want_dropped, (m, matched, want_dropped)
        probe_ts.append(best)
        print(
            f"x{m:<3d} incremental_trimmed_dedup {best:7.2f}s "
            f"(matched {matched}/{BATCH_CLIPS}, history {BASE_CLIPS * m})",
            file=sys.stderr,
        )
        # --- sink: batch 0 = history (untimed), batch 1 = fixed probe
        root = tempfile.mkdtemp(prefix=f"trim_sink_soak_x{m}_")
        paths = [os.path.join(root, p) for p in ("corpus", "toks", "seqs")]
        sink = incremental_trim_dedup_sink(*paths)
        sink(hist, 0)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            sink(batch, 1)
            best = min(best, time.perf_counter() - t0)
        admitted = (
            spark.read.parquet(paths[0]).filter("media_id >= 10000000").count()
        )
        assert admitted == BATCH_CLIPS - want_dropped, (m, admitted)
        sink_ts.append(best)
        print(
            f"x{m:<3d} incremental_trim_dedup_sink batch {best:7.2f}s "
            f"(admitted {admitted}/{BATCH_CLIPS})",
            file=sys.stderr,
        )
        shutil.rmtree(root, ignore_errors=True)

    for name, ts in (
        ("incremental_trimmed_dedup` (fixed 400-clip batch vs growing index)", probe_ts),
        ("incremental_trim_dedup_sink` (fixed 400-clip batch, at-rest index)", sink_ts),
    ):
        cells = " | ".join(f"{t:.2f} s" for t in ts)
        print(f"| `{name} | {cells} | **{_fit(mults, ts):.2f}** |")


if __name__ == "__main__":
    main()
