#!/usr/bin/env python
"""1x/3x/10x growing-HISTORY soak for the streaming chunk-overlap
admission sink (VERDICT r10 item 7): the media tier's O(batch) claim is
measured (exponent -0.02); this measures the same claim for
chunk_admission_sink — a FIXED 400-doc batch admitted against an at-rest
chunk LSH index built from a history that grows 1x -> 10x. The per-batch
cost must stay flat: the sink probes the index via band-bucket
collisions (O(batch chunks x collision rate)), never rescans history.

Corpus shape: every doc is 4 chunks of 20 tokens; 10 % of history docs
carry one shared template chunk (realistic boilerplate collisions, not
the 31-word degenerate vocabulary); the probe batch is half
template-recycling docs (3/4 dup chunks -> must be REJECTED at the 20 %
cap) and half fresh docs (must be admitted) — so the soak also asserts
the admission decision stays correct at every scale.

Run: python scripts/admission_soak.py   (writes under /tmp, nothing in
the repo; prints the docs/SCALE.md row to stdout, per-scale lines to
stderr)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 3_000
BATCH_DOCS = 400
TEMPLATE_EVERY = 10  # 10% of history docs carry the template chunk


def _chunk(prefix: str, n: int = 20) -> str:
    return " ".join(f"{prefix}w{i}" for i in range(n))


TEMPLATE = _chunk("tmpl")


def history_rows(mult: int):
    n = BASE_DOCS * mult
    rows = []
    for i in range(n):
        parts = [_chunk(f"h{i}c{j}") for j in range(4)]
        if i % TEMPLATE_EVERY == 0:
            parts[0] = TEMPLATE
        rows.append((i, " ".join(parts)))
    return rows


def batch_rows():
    rows = []
    for i in range(BATCH_DOCS):
        doc_id = 10_000_000 + i
        if i % 2 == 0:  # template-heavy: 3 of 4 chunks recycled -> reject
            rows.append(
                (doc_id, " ".join([TEMPLATE] * 3 + [_chunk(f"b{i}f")]))
            )
        else:  # fresh: admit
            rows.append(
                (doc_id, " ".join(_chunk(f"b{i}c{j}") for j in range(4)))
            )
    return rows


def main() -> None:
    from network_iq_spark.session import get_spark
    from network_iq_spark.streaming.dedup import chunk_admission_sink

    spark = get_spark(app_name="admission-soak")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    runs = int(os.environ.get("SOAK_RUNS", "2"))

    batch = spark.createDataFrame(
        batch_rows(), "doc_id bigint, text string"
    ).localCheckpoint()
    want_admitted = BATCH_DOCS // 2

    ts = []
    for m in mults:
        root = tempfile.mkdtemp(prefix=f"admission_soak_x{m}_")
        corpus = os.path.join(root, "corpus")
        bands = os.path.join(root, "bands")
        sets_ = os.path.join(root, "sets")
        sink = chunk_admission_sink(corpus, bands, sets_)
        # untimed: materialize the at-rest history index (batch 0) — the
        # artifact a deployment already has on disk
        hist = spark.createDataFrame(
            history_rows(m), "doc_id bigint, text string"
        )
        sink(hist, 0)
        # timed: the fixed probe batch as batch 1; re-running the same
        # batch_id is the sink's replay path (strictly-earlier-batch
        # probes), so min-of-N over replays times the identical work
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            sink(batch, 1)
            best = min(best, time.perf_counter() - t0)
        admitted = (
            spark.read.parquet(corpus)
            .filter("doc_id >= 10000000")
            .count()
        )
        assert admitted == want_admitted, (m, admitted, want_admitted)
        ts.append(best)
        print(
            f"x{m:<3d} chunk_admission_sink batch {best:7.2f}s "
            f"(admitted {admitted}/{BATCH_DOCS}, history {BASE_DOCS * m})",
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
        f"| `chunk_admission_sink` (fixed 400-doc batch, at-rest index) "
        f"| {cells} | **{e:.2f}** |"
    )


if __name__ == "__main__":
    main()
