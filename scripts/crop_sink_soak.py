#!/usr/bin/env python
"""1x/3x/10x growing-HISTORY soak for the streaming crop-dedup sink
(VERDICT r11 item 7 / r12): the chunk-admission sink's replay-at-scale
measurement, for the crop tier — a FIXED 400-image batch probed against
an at-rest sub-block token + grid index built from a history growing
1x -> 10x. Per-batch cost must stay flat: the sink probes by token
collision (O(batch x collision)), never rescans history.

Corpus shape: 8x8 luma grids from a deterministic per-pixel hash; the
probe batch is half (1,1)-crops of history images (pigeonhole recall
1.0 -> must be DROPPED) and half fresh images (must be admitted) — so
the soak also asserts the dedup decision stays correct at every scale,
including under replay (re-running the same batch_id is the sink's
strictly-earlier-batch probe path).

Run: python scripts/crop_sink_soak.py   (writes under /tmp, nothing in
the repo; prints the docs/SCALE.md row to stdout, per-scale lines to
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

BASE_IMGS = 2_000
BATCH_IMGS = 400


def _grid(seed: int, side: int = 8) -> list[int]:
    h = hashlib.md5(f"cs{seed}".encode()).digest() * 4
    return [h[i] for i in range(side * side)]


def _crop(px: list[int], dr: int = 1, dc: int = 1, side: int = 8) -> list[int]:
    n = side - 1
    return [px[(i + dr) * side + (j + dc)] for i in range(n) for j in range(n)]


def history_rows(mult: int):
    return [(i, 8, 8, _grid(i)) for i in range(BASE_IMGS * mult)]


def batch_rows():
    rows = []
    for i in range(BATCH_IMGS):
        mid = 10_000_000 + i
        if i % 2 == 0:  # crop of history image i -> must be dropped
            rows.append((mid, 7, 7, _crop(_grid(i))))
        else:  # fresh -> must be admitted
            rows.append((mid, 8, 8, _grid(1_000_000 + i)))
    return rows


def main() -> None:
    from network_iq_spark.session import get_spark
    from network_iq_spark.streaming.dedup import incremental_crop_dedup_sink

    spark = get_spark(app_name="crop-sink-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    schema = "media_id bigint, w int, h int, px array<int>"
    batch = spark.createDataFrame(batch_rows(), schema).localCheckpoint()
    want_admitted = BATCH_IMGS // 2

    ts = []
    for m in mults:
        root = tempfile.mkdtemp(prefix=f"crop_sink_soak_x{m}_")
        corpus = os.path.join(root, "corpus")
        toks = os.path.join(root, "toks")
        grids = os.path.join(root, "grids")
        sink = incremental_crop_dedup_sink(corpus, toks, grids, max_crop=2)
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
            f"x{m:<3d} incremental_crop_dedup_sink batch {best:7.2f}s "
            f"(admitted {admitted}/{BATCH_IMGS}, history {BASE_IMGS * m})",
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
        f"| `incremental_crop_dedup_sink` (fixed 400-image batch, "
        f"at-rest index) | {cells} | **{e:.2f}** |"
    )


if __name__ == "__main__":
    main()
