#!/usr/bin/env python
"""Skew soaks for the r9 singleton families (VERDICT r9 item 8): the
planted-template hot-bucket experiment, run (a) at CHUNK grain against
the registered chunk_near_dup_pairs / _capped queries, and (b) on the
image dHash family with planted identical-crop clusters (one hot
(seg, seg_val) bucket per segment), uncapped vs hamming_blocked_pairs'
new max_bucket_size guard.

Chunk-grain skew axis: HOT_FRACTION of docs EMBED one boilerplate
20-token paragraph (unique content around it) — doc-grain MinHash
dilutes the template below threshold, but at chunk grain every template
chunk is near-identical, so all of them pile into the same band buckets:
|B|² candidate pairs per band, the worst case the r9 soak measured at
exponent 0.81. The cap (chunk_near_dup_pairs_capped) bounds it.

Image skew axis: CROP_FRACTION of images are byte-identical copies of
one image (the same crop re-encoded across pages) — all 7 segments of
their dHash collide, |B|² verify pairs with no cap.

Prints docs/SCALE.md markdown rows. Run:

    python scripts/media_skew_soak.py
    SOAK_MULTS=1,3 python scripts/media_skew_soak.py
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

from scale_soak import BASE_DOCS, SOAK_DIR, synth_documents  # noqa: E402

HOT_FRACTION = 0.02
CROP_FRACTION = 0.02
BASE_IMGS = 2_000  # sf0.1 embeddings count
TEMPLATE = (
    "subscribe to our newsletter for updates terms of service privacy "
    "policy all rights reserved contact us follow share like comment"
)  # exactly 20 tokens = one chunk


def build_chunkhot_corpus(mult: int) -> str:
    out = os.path.join(SOAK_DIR, f"chunkhot{mult}")
    if os.path.isdir(out):
        return out
    n = BASE_DOCS * mult
    tbl = synth_documents(n)
    texts = tbl.column("text").to_pylist()
    rng = np.random.default_rng(1000 + mult)
    hot_idx = rng.choice(n, size=int(n * HOT_FRACTION), replace=False)
    for i in hot_idx:
        # template paragraph embedded mid-doc: chunk-aligned because the
        # doc prefix is padded to a chunk boundary (20 tokens)
        toks = texts[int(i)].split()
        prefix = (toks * 4)[:20]
        texts[int(i)] = " ".join(prefix) + " " + TEMPLATE + " " + " ".join(toks)
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["text"] = pa.array(texts, pa.string())
    cols["n_chars"] = pa.array([len(t) for t in texts], pa.int64())
    os.makedirs(out + ".tmp", exist_ok=True)
    pq.write_table(pa.table(cols), f"{out}.tmp/documents.parquet")
    shutil.move(out + ".tmp", out)
    return out


def synth_images(mult: int):
    import hashlib

    n = BASE_IMGS * mult
    rng = np.random.default_rng(2000 + mult)
    crop_idx = set(rng.choice(n, size=int(n * CROP_FRACTION), replace=False).tolist())

    def px(i: int) -> list[int]:
        if i in crop_idx:  # the shared crop, byte-identical everywhere
            seed = "crop"
        else:
            seed = str(i)
        return [
            int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:2], 16)
            for j in range(64)
        ]

    return [(i, px(i)) for i in range(n)]


def fit_exponent(mults, ts):
    xs, ys = [math.log(m) for m in mults], [math.log(t) for t in ts]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )


def main() -> None:
    from network_iq_spark.operators import dedup as D
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="media-skew-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    rows = []

    # (a) chunk grain: the registered sheet queries against hot corpora
    for qname in ("chunk_near_dup_pairs", "chunk_near_dup_pairs_capped"):
        ts, np_ = [], {}
        for m in mults:
            d = build_chunkhot_corpus(m)
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                QUERIES[qname](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
            np_[m] = QUERIES[qname](spark, d).count()
            print(f"x{m:<3d} {qname:32s} {best:7.2f}s pairs={np_[m]:,}", file=sys.stderr)
        rows.append((f"{qname} (hot-chunk)", mults, ts, np_[mults[-1]]))

    # (b) image dHash: identical-crop clusters, capped vs uncapped blocking
    for label, kw in (
        ("image_hamming_uncapped (hot-crop)", {}),
        ("image_hamming_cap50 (hot-crop)", {"max_bucket_size": 50}),
    ):
        ts, np_ = [], {}
        for m in mults:
            df = spark.createDataFrame(
                synth_images(m), "media_id long, px array<int>"
            ).localCheckpoint()
            hashed = df.select("media_id", D.image_dhash("px").alias("dh"))
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                D.hamming_blocked_pairs(
                    hashed, "dh", 6, n_bits=56, id_col="media_id", **kw
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
            np_[m] = D.hamming_blocked_pairs(
                hashed, "dh", 6, n_bits=56, id_col="media_id", **kw
            ).count()
            print(f"x{m:<3d} {label:32s} {best:7.2f}s pairs={np_[m]:,}", file=sys.stderr)
        rows.append((label, mults, ts, np_[mults[-1]]))

    print("| variant | " + " | ".join(f"{m}x" for m in mults) + " | exponent | pairs at 10x |")
    print("|" + "---|" * (len(mults) + 3))
    for label, ms, ts, pairs in rows:
        cells = " | ".join(f"{t:.2f} s" for t in ts)
        print(f"| `{label}` | {cells} | {fit_exponent(ms, ts):.2f} | {pairs:,} |")


if __name__ == "__main__":
    main()
