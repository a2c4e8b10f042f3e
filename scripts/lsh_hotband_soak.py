#!/usr/bin/env python
"""Hot-band LSH soak (VERDICT r8 item 8): the (band, bucket) shuffle's
skew axis, which the uniform soak and the aggregate/window/join skew soak
both miss.

Synthesizes corpora at 1x/3x/10x of the sf0.1 doc count where
HOT_FRACTION of docs are instances of ONE boilerplate template with a
unique trailing token (near-identical, not byte-identical — exact dedup
would not remove them, but most of their minhash bands collide, so they
pile into a handful of degenerate buckets). This is the celebrity-bucket
case every crawled corpus has: |B| template docs cost |B|^2 candidate
pairs per colliding band, REAL join output that no AQE split makes
cheaper — splitting the partition parallelizes the blowup, it does not
shrink it.

Times minhash_lsh_pairs uncapped vs max_bucket_size=50 (b=16/r=1, the
recall-heavy config), counts candidate pairs for both, and prints the
markdown rows for docs/SCALE.md. Run:

    python scripts/lsh_hotband_soak.py
    SOAK_MULTS=1,3 python scripts/lsh_hotband_soak.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_soak import BASE_DOCS, SOAK_DIR, VOCAB, synth_documents  # noqa: E402

HOT_FRACTION = 0.02
MAX_BUCKET = 50
TEMPLATE = (
    "order table scan filter group window join merge batch stream plan "
    "data value row column key hash sort read write"
)


def build_hot_corpus(mult: int) -> str:
    out = os.path.join(SOAK_DIR, f"hot{mult}")
    if os.path.isdir(out):
        return out
    n = BASE_DOCS * mult
    tbl = synth_documents(n)
    texts = tbl.column("text").to_pylist()
    rng = np.random.default_rng(mult)
    hot_idx = rng.choice(n, size=int(n * HOT_FRACTION), replace=False)
    for j, i in enumerate(hot_idx):
        texts[int(i)] = f"{TEMPLATE} v{j}"
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["text"] = pa.array(texts, pa.string())
    cols["n_chars"] = pa.array([len(t) for t in texts], pa.int64())
    os.makedirs(out + ".tmp", exist_ok=True)
    pq.write_table(pa.table(cols), f"{out}.tmp/documents.parquet")
    shutil.move(out + ".tmp", out)
    return out


def main() -> None:
    from network_iq_spark.operators import dedup as D
    from network_iq_spark.session import get_spark
    from network_iq_spark.sources import load_table

    spark = get_spark(app_name="lsh-hotband-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    variants = {
        "minhash_lsh_hotband_uncapped": dict(max_bucket_size=None),
        f"minhash_lsh_hotband_cap{MAX_BUCKET}": dict(max_bucket_size=MAX_BUCKET),
    }
    times: dict[str, dict[int, float]] = {v: {} for v in variants}
    pairs: dict[str, dict[int, int]] = {v: {} for v in variants}
    for m in mults:
        d = build_hot_corpus(m)
        docs = load_table(spark, d, "documents")
        for v, kw in variants.items():
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                D.minhash_lsh_pairs(
                    docs, threshold=0.0, n_bands=16, rows_per_band=1, **kw
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[v][m] = best
            pairs[v][m] = D.minhash_lsh_pairs(
                docs, threshold=0.0, n_bands=16, rows_per_band=1, **kw
            ).count()
            print(
                f"x{m:<3d} {v:34s} {best:7.2f}s  pairs={pairs[v][m]:,}",
                file=sys.stderr,
            )

    header = (
        "| variant | "
        + " | ".join(f"{m}x ({BASE_DOCS*m//1000}k docs)" for m in mults)
        + " | exponent | pairs at 10x |"
    )
    print(header)
    print("|" + "---|" * (len(mults) + 3))
    for v in variants:
        ts = [times[v][m] for m in mults]
        xs, ys = [math.log(m) for m in mults], [math.log(t) for t in ts]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        e = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
            (x - xbar) ** 2 for x in xs
        )
        cells = " | ".join(f"{t:.2f} s" for t in ts)
        print(f"| `{v}` | {cells} | {e:.2f} | {pairs[v][mults[-1]]:,} |")


if __name__ == "__main__":
    main()
