#!/usr/bin/env python
"""1x/3x/10x soak for the cross-axis duplicate-RESOLUTION tail
(queries/media.py _resolution_from_edges — r14, VERDICT item 2): edge
union -> min-label connected components over duplicate-involved
vertices -> per-cluster (keep_id, n_members, n_axes, n_dropped) rows.

The per-modality resolution queries compose registered arm tiers (each
already soaked: transform_soak / trim_soak / crop_soak) with this one
shared tail, so the tail's scaling is the only new claim to measure:
its input is the PAIR set (duplicate density x corpus, never the
corpus), and its cost is the CC fixpoint (rounds = component diameter)
plus two bounded rollups.

Corpus shape: 2 % of originals carry derivatives, cycling 1/2/3 axes
so clusters of every shape appear; every third 3-axis cluster also
gets a DERIVATIVE-OF-DERIVATIVE chain edge (a re-encode of a re-encode
— diameter 3, the closure case the pairwise arms never emit directly).
Each scale asserts the EXACT expected resolution rows (membership,
axis count, min-label keeper), not just counts.

Run: python scripts/resolution_soak.py   (prints the docs/SCALE.md
rows to stdout, per-scale lines to stderr)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 40_000  # edges are the input grain, so the soak scales pair volume
TWIN_EVERY = 50  # 2% planted duplicate families
OFFS = {"crop": 10_000_000, "resample": 20_000_000, "trim": 30_000_000}
CHAIN_OFF = 40_000_000


def edge_rows(mult: int):
    """(src, dst, axis) edges + the exact expected resolution rows."""
    edges, expect = [], {}
    for i in range(BASE * mult):
        if i % TWIN_EVERY:
            continue
        fam = (i // TWIN_EVERY) % 3  # 0: 1 axis, 1: 2 axes, 2: 3 axes
        axes = list(OFFS)[: fam + 1]
        members = 1
        for ax in axes:
            edges.append((i, i + OFFS[ax], ax))
            members += 1
        if fam == 2 and (i // TWIN_EVERY) % 9 == 2:
            # chain: a trim of the crop derivative — closure must pull
            # it into the original's cluster (diameter 3)
            edges.append((i + OFFS["crop"], i + CHAIN_OFF, "trim"))
            members += 1
        n_axes = len(axes) if fam < 2 else 3
        expect[i] = (members, n_axes, members - 1)
    return edges, expect


def main() -> None:
    from network_iq_spark.queries.media import _resolution_from_edges
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="resolution-soak")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: one untimed pass absorbs JVM/codegen startup so the 1x
    # cell measures the plan (the transform_soak discipline)
    w_edges, w_expect = edge_rows(1)
    wdf = spark.createDataFrame(w_edges, "src bigint, dst bigint, axis string")
    assert {
        r.keep_id: (r.n_members, r.n_axes, r.n_dropped)
        for r in _resolution_from_edges(wdf).collect()
    } == w_expect

    results = []
    for mult in (1, 3, 10):
        edges, expect = edge_rows(mult)
        df = spark.createDataFrame(
            edges, "src bigint, dst bigint, axis string"
        )
        t0 = time.perf_counter()
        got = {
            r.keep_id: (r.n_members, r.n_axes, r.n_dropped)
            for r in _resolution_from_edges(df).collect()
        }
        dt = time.perf_counter() - t0
        assert got == expect, (
            f"mult={mult}: {len(got)} clusters vs {len(expect)} expected; "
            f"first diffs: "
            f"{dict(list({k: (got.get(k), expect.get(k)) for k in set(got) ^ set(expect) or set(list(expect)[:3])}.items())[:3])}"
        )
        results.append((mult, len(edges), dt))
        print(
            f"mult={mult}: {len(edges)} edges -> {len(expect)} clusters "
            f"exact in {dt:.2f} s",
            file=sys.stderr,
        )

    (m1, e1, t1), _, (m10, e10, t10) = results
    expo = math.log(t10 / t1) / math.log(e10 / e1)
    cells = " | ".join(f"{t:.2f} s" for _, _, t in results)
    print(
        f"| `_resolution_from_edges` (2 % planted families, 1-3 axes + "
        f"chains) | {cells} | **{expo:.2f}** | exact clusters at every "
        f"scale |"
    )


if __name__ == "__main__":
    main()
