#!/usr/bin/env python
"""Hot-key skew soak (VERDICT r7 item 8).

The uniform-N soak (scripts/scale_soak.py) measures growth exponents with
all keys equal; this one measures the OTHER failure axis — a single hot
key owning ~50% of the rows (the celebrity cell / degenerate band every
100 TB deployment eventually meets) — and quantifies what the engine's
documented mitigations actually buy vs the naive plans:

- windows: naive ``Window.partitionBy(key)`` sorts the hot key in ONE
  task (AQE cannot split a window partition) vs
  ``time_sliced_rolling`` (operators/windows.py — partition split by a
  calendar slice, hot key becomes #slices bounded tasks);
- aggregation: naive ``groupBy(key).agg`` (partial aggregation already
  absorbs most key skew map-side — measured, not assumed) vs
  ``salted_sum_count`` (operators/skew.py two-phase salted aggregate);
- joins: sort-merge fact⋈dim with AQE skew-join OFF (the hot key's rows
  land in one shuffle partition — the straggler) vs AQE skew-join ON
  (runtime partition split) vs ``salted_broadcast_join``
  (operators/skew.py — no shuffle at all).

Synthesizes events-like tables at 1x/3x/10x with HOT_FRACTION of rows on
one key and the rest uniform over N_KEYS-1 keys, times each variant
(min of RUNS), and prints per-variant (N, seconds) curves with fitted
growth exponents — paste the table into docs/SCALE.md. Corpora land
under .soak/ (gitignored). Run:

    python scripts/skew_soak.py             # 1x 3x 10x
    SKEW_MULTS=1,3 python scripts/skew_soak.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_ROWS = 400_000
HOT_FRACTION = 0.5
N_KEYS = 100
ROLL_N = 100  # trailing-frame length for the window variants
SALTS = 32
RUNS = 2
SOAK_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".soak"
)


def synth_skewed_events(n: int, seed: int = 11) -> pa.Table:
    """cell_id 0 owns HOT_FRACTION of rows; the rest spread uniformly over
    cells 1..N_KEYS-1. Timestamps cover 12 months so a yyyy-MM slice
    splits the hot key ~12 ways; rows are shuffled so the hot key
    interleaves across input files like real telemetry."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * HOT_FRACTION)
    cells = np.concatenate(
        [
            np.zeros(n_hot, dtype=np.int64),
            rng.integers(1, N_KEYS, size=n - n_hot),
        ]
    )
    rng.shuffle(cells)
    base = np.datetime64("2026-01-01T00:00:00")
    ts = base + rng.integers(0, 360 * 24 * 3600, size=n).astype("timedelta64[s]")
    order = np.argsort(rng.random(n))  # shuffle row order
    return pa.table(
        {
            "cell_id": pa.array(cells[order]),
            "ts": pa.array(ts[order]),
            "value": pa.array(rng.normal(50.0, 10.0, size=n)[order]),
        }
    )


def build(mult: int) -> str:
    d = os.path.join(SOAK_DIR, f"skew_mult{mult}")
    p = os.path.join(d, "events.parquet")
    if not os.path.exists(p):
        os.makedirs(d, exist_ok=True)
        pq.write_table(synth_skewed_events(BASE_ROWS * mult), p)
    return p


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from network_iq_spark.operators.skew import (
        salted_broadcast_join,
        salted_sum_count,
    )
    from network_iq_spark.operators.windows import time_sliced_rolling
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="skew-soak")
    spark.sparkContext.setLogLevel("ERROR")
    mults = [
        int(x) for x in os.environ.get("SKEW_MULTS", "1,3,10").split(",")
    ]

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    def with_confs(confs: dict, fn):
        old = {k: spark.conf.get(k) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            return fn()
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)

    curves: dict[str, list[tuple[int, float]]] = {}
    for mult in mults:
        path = build(mult)
        ev = spark.read.parquet(path)
        n = BASE_ROWS * mult
        dim = (
            spark.range(N_KEYS)
            .select(
                F.col("id").alias("cell_id"),
                (F.col("id") % 7).alias("region"),
            )
        )

        def naive_window():
            w = (
                Window.partitionBy("cell_id")
                .orderBy("ts")
                .rowsBetween(-(ROLL_N - 1), 0)
            )
            return ev.withColumn("rmean", F.avg("value").over(w))

        def sliced_window():
            return time_sliced_rolling(
                ev, ["cell_id"], "ts", ["value"], n=ROLL_N, slice_fmt="yyyy-MM"
            )

        def naive_agg():
            return ev.groupBy("cell_id").agg(
                F.sum("value").alias("s"), F.count("*").alias("c")
            )

        def salted_agg():
            return salted_sum_count(ev, ["cell_id"], "value", n_salts=SALTS)

        smj_confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "false",
        }
        aqe_confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        }

        def smj_join():
            return ev.join(dim, "cell_id").groupBy("region").agg(
                F.sum("value").alias("s")
            )

        variants = {
            "window_naive": lambda: timed(naive_window),
            "window_time_sliced": lambda: timed(sliced_window),
            "agg_naive": lambda: timed(naive_agg),
            "agg_salted": lambda: timed(salted_agg),
            "join_smj_noaqe": lambda: with_confs(
                smj_confs, lambda: timed(smj_join)
            ),
            "join_smj_aqe_skew": lambda: with_confs(
                aqe_confs, lambda: timed(smj_join)
            ),
            "join_salted_bcast": lambda: timed(
                lambda: salted_broadcast_join(
                    ev, dim, "cell_id", n_salts=SALTS
                )
                .groupBy("region")
                .agg(F.sum("value").alias("s"))
            ),
        }
        for name, run in variants.items():
            sec = run()
            curves.setdefault(name, []).append((n, sec))
            print(f"mult={mult:>2} n={n:>9,} {name:<20} {sec:7.2f}s", flush=True)

    print("\n== fitted growth exponents (log t = a + e log N) ==")
    for name, pts in curves.items():
        if len(pts) >= 2:
            xs = [math.log(p[0]) for p in pts]
            ys = [math.log(max(p[1], 1e-3)) for p in pts]
            e = np.polyfit(xs, ys, 1)[0]
            curve = "  ".join(f"{s:.2f}s" for _, s in pts)
            print(f"{name:<20} exponent={e:5.2f}   [{curve}]")


if __name__ == "__main__":
    main()
