#!/usr/bin/env python
"""Materialize the at-rest LANDMARK index for every testdata SF (the
build_media_index.py discipline — READ queries never write into the
checkout; artifacts are built here alone and committed):

- aux_data/landmark_index/<sf> — landmark_index over the audio walks
  (media_id, s, toks: array<struct<tok, pos>>), read by
  ``incremental_landmark_probe``.

The index stores signal + fingerprints in one row, so the probe's
verify never needs a second corpus join. Contents are exactly what the
probe's in-plan fallback computes; the planted-twin sheet test pins
artifact/fallback equality (the landmark family is bench-only, so
there is no DuckDB oracle — the fallback-equality test carries the
freshness check instead)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_iq_spark.operators import dedup as D  # noqa: E402
from network_iq_spark.queries.media import _AUX_DATA_DIR, _aud_walks  # noqa: E402
from network_iq_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="build-landmark-index")
    spark.sparkContext.setLogLevel("WARN")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {sf}: no embeddings table")
            continue
        out = os.path.join(_AUX_DATA_DIR, "landmark_index", sf)
        D.landmark_index(_aud_walks(spark, sf_dir)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        print(f"{sf}: {spark.read.parquet(out).count()} landmark index rows")


if __name__ == "__main__":
    main()
