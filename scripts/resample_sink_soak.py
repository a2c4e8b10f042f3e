#!/usr/bin/env python
"""1x/3x/10x growing-HISTORY soak for the streaming resample-dedup sink
(r13, VERDICT r12 item 7): the crop-sink replay-at-scale measurement,
for the scale axis — a FIXED 400-clip batch probed against an at-rest
(own_key, derived_key) index built from a history growing 1x -> 10x.
Per-batch cost must stay flat: the sink probes by two exact key
equi-joins (O(batch x collision)), never rescans history.

Corpus shape: 64-sample signed clips from a deterministic per-sample
hash; the probe batch is half 2:1 decimations of history clips (exact
derived key -> must be DROPPED) and half fresh clips (must be
admitted) — so the soak also asserts the dedup decision stays correct
at every scale, including under replay (re-running the same batch_id
is the sink's strictly-earlier-batch probe path).

Run: python scripts/resample_sink_soak.py   (writes under /tmp, nothing
in the repo; prints the docs/SCALE.md row to stdout, per-scale lines to
stderr)
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


def _clip(seed: int, n: int = 64) -> list[int]:
    h = (hashlib.md5(f"rs{seed}".encode()).digest() * ((n // 16) + 1))[:n]
    return [-32000 + (b * 257) % 64000 for b in h]


def _dec(s: list[int]) -> list[int]:
    return [int((s[2 * k] + s[2 * k + 1]) / 2) for k in range(len(s) // 2)]


def history_rows(mult: int):
    return [(i, _clip(i)) for i in range(BASE_CLIPS * mult)]


def batch_rows():
    rows = []
    for i in range(BATCH_CLIPS):
        mid = 10_000_000 + i
        if i % 2 == 0:  # decimation of history clip i -> must be dropped
            rows.append((mid, _dec(_clip(i))))
        else:  # fresh -> must be admitted
            rows.append((mid, _clip(1_000_000 + i)))
    return rows


def main() -> None:
    from network_iq_spark.session import get_spark
    from network_iq_spark.streaming.dedup import incremental_resample_dedup_sink

    spark = get_spark(app_name="resample-sink-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    schema = "media_id bigint, s array<int>"
    batch = spark.createDataFrame(batch_rows(), schema).localCheckpoint()
    want_admitted = BATCH_CLIPS // 2

    ts = []
    for m in mults:
        root = tempfile.mkdtemp(prefix=f"resample_sink_soak_x{m}_")
        corpus = os.path.join(root, "corpus")
        index = os.path.join(root, "index")
        sink = incremental_resample_dedup_sink(corpus, index, factor=2)
        # untimed: materialize the at-rest index (batch 0)
        sink(spark.createDataFrame(history_rows(m), schema), 0)
        # timed: the fixed probe batch as batch 1; replays are the
        # strictly-earlier-batch probe path, so min-of-N times the
        # identical work and asserts replay convergence
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            sink(batch, 1)
            best = min(best, time.perf_counter() - t0)
        admitted = (
            spark.read.parquet(corpus).filter("media_id >= 10000000").count()
        )
        assert admitted == want_admitted, (m, admitted, want_admitted)
        ts.append(best)
        print(
            f"x{m:<3d} incremental_resample_dedup_sink batch {best:7.2f}s "
            f"(admitted {admitted}/{BATCH_CLIPS}, history {BASE_CLIPS * m})",
            file=sys.stderr,
        )
        shutil.rmtree(root, ignore_errors=True)

    xs, ys = [math.log(m) for m in mults], [math.log(t) for t in ts]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    e = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )
    cells = " | ".join(f"{t:.2f} s" for t in ts)
    print(
        f"| `incremental_resample_dedup_sink` (fixed 400-clip batch, "
        f"at-rest index) | {cells} | **{e:.2f}** |"
    )


if __name__ == "__main__":
    main()
