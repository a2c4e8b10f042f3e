#!/usr/bin/env python
"""Materialize the at-rest transform-arm PAIR/EDGE tables for every
testdata SF (r14, VERDICT item 5 — the build_media_index.py
discipline: READ queries never write into the checkout; artifacts are
built here alone and committed):

- aux_data/transform_edges/image/<sf>  — (src, dst, axis) union of the
  crop / scale / rotation pair tiers;
- aux_data/transform_edges/audio/<sf>  — resample / trim;
- aux_data/transform_edges/video/<sf>  — crop / resample / trim.

This is the deployment posture: the arm tiers run ONCE per corpus and
persist their pairs; every downstream aggregate (cross-axis resolution,
resolution-aware keep-best) READS the persisted edges instead of
re-deriving eight arm pipelines per query. Contents are exactly what
the queries' in-plan fallbacks compute and what their DuckDB oracles
recompute end-to-end, so sheet parity doubles as the artifact-freshness
check — a stale edge table hash-mismatches the oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_iq_spark.queries.media import (  # noqa: E402
    _AUX_DATA_DIR,
    _audio_transform_edges_inplan,
    _image_transform_edges_inplan,
    _video_transform_edges_inplan,
)
from network_iq_spark.session import get_spark  # noqa: E402

BUILDERS = {
    "image": _image_transform_edges_inplan,
    "audio": _audio_transform_edges_inplan,
    "video": _video_transform_edges_inplan,
}


def main() -> None:
    spark = get_spark(app_name="build-transform-edges")
    spark.sparkContext.setLogLevel("WARN")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {sf}: no embeddings table")
            continue
        for mod, build in BUILDERS.items():
            out = os.path.join(_AUX_DATA_DIR, "transform_edges", mod, sf)
            build(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(out)
            print(f"{sf}/{mod}: {spark.read.parquet(out).count()} edges")


if __name__ == "__main__":
    main()
