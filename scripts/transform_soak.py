#!/usr/bin/env python
"""1x/3x/10x soak for the r12 transform-matrix cells (VERDICT r11 items
5 & 6): the audio RESAMPLE-derivative tier (resampled_derivative_pairs —
exact equi-join on the md5 of the 2:1 truncating-box-decimated signal)
and the VIDEO per-frame crop tier (video_cropped_pairs — frame-0
pigeonhole tokens + multi-plane exact lag scan).

Corpus shape: 2 % planted twins in each corpus (the crop_soak density) —
64-sample signed walks with their exact 2:1 decimations; 4-frame 4x4
clips with a consistent per-frame (dr, dc) crop cycling through
(1,0)/(0,1)/(1,1). Each scale asserts recall 1.0 (pigeonhole /
exact-key, not an S-curve) and zero false positives (exact verify).

Run: python scripts/transform_soak.py   (prints the docs/SCALE.md rows
to stdout, per-scale lines to stderr)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 2_000
TWIN_EVERY = 50  # 2% planted twins
TWIN_OFF = 10_000_000


def _vals(seed: int, n: int, lo: int, hi: int) -> list[int]:
    h = (hashlib.md5(f"ts{seed}".encode()).digest() * ((n // 16) + 1))[:n]
    span = hi - lo
    return [lo + (b * 257) % span for b in h]


def audio_rows(mult: int):
    rows, want = [], set()
    for i in range(BASE * mult):
        s = _vals(i, 64, -32000, 32000)
        rows.append((i, s))
        if i % TWIN_EVERY == 0:
            # exact truncating 2:1 box decimation (the operator's claim)
            d = [
                int((s[2 * k] + s[2 * k + 1]) / 2)  # trunc toward zero
                for k in range(32)
            ]
            rows.append((i + TWIN_OFF, d))
            want.add((i, i + TWIN_OFF))
    return rows, want


def video_resample_rows(mult: int):
    rows, want = [], set()
    for i in range(BASE * mult):
        px = _vals(i, 64, 0, 256)
        rows.append((i, px))
        if i % TWIN_EVERY == 0:
            tw = [
                (px[g * 32 + p] + px[g * 32 + 16 + p]) // 2
                for g in range(2)
                for p in range(16)
            ]
            rows.append((i + TWIN_OFF, tw))
            want.add((i, i + TWIN_OFF))
    return rows, want


def video_rows(mult: int):
    rows, want = [], set()
    for i in range(BASE * mult):
        px = _vals(i, 64, 0, 256)
        rows.append((i, 4, 4, px))
        if i % TWIN_EVERY == 0:
            dr, dc = [(1, 0), (0, 1), (1, 1)][(i // TWIN_EVERY) % 3]
            crop = [
                px[f * 16 + (r + dr) * 4 + (c + dc)]
                for f in range(4)
                for r in range(3)
                for c in range(3)
            ]
            rows.append((i + TWIN_OFF, 3, 3, crop))
            want.add((i, i + TWIN_OFF))
    return rows, want


def _fit(mults, ts):
    xs, ys = [math.log(m) for m in mults], [math.log(t) for t in ts]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )


def main() -> None:
    from network_iq_spark.operators import dedup as D
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="transform-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    rows_out = []
    for name, mk, plan, pair_cols in [
        (
            "resampled_derivative_pairs",
            audio_rows,
            lambda df: D.resampled_derivative_pairs(df, factor=2),
            ("full_id", "resampled_id"),
        ),
        (
            "video_cropped_pairs",
            video_rows,
            lambda df: D.video_cropped_pairs(df, frames=4, max_crop=1, side=4),
            ("id_a", "id_b"),
        ),
        (
            "video_resampled_pairs",
            video_resample_rows,
            lambda df: D.resampled_derivative_pairs(df, factor=2, stride=16),
            ("full_id", "resampled_id"),
        ),
    ]:
        ts = []
        for m in mults:
            rows, want = mk(m)
            schema = (
                "media_id bigint, w int, h int, px array<int>"
                if name == "video_cropped_pairs"
                else "media_id bigint, s array<int>"
            )
            df = spark.createDataFrame(rows, schema).localCheckpoint()
            best, got = float("inf"), None
            for _ in range(runs):
                t0 = time.perf_counter()
                got = {
                    (r[pair_cols[0]], r[pair_cols[1]])
                    for r in plan(df).collect()
                }
                best = min(best, time.perf_counter() - t0)
            # recall 1.0 and zero false positives, at every scale
            assert got == want, (
                name, m, len(got - want), len(want - got),
            )
            ts.append(best)
            print(
                f"x{m:<3d} {name} {best:7.2f}s "
                f"({len(want)} planted twins, all recovered, 0 FP)",
                file=sys.stderr,
            )
        cells = " | ".join(f"{t:.2f} s" for t in ts)
        rows_out.append(
            f"| `{name}` (2 % planted twins) | {cells} "
            f"| **{_fit(mults, ts):.2f}** | 1.00 / 0 FP at every scale |"
        )
    print("\n".join(rows_out))


if __name__ == "__main__":
    main()
