#!/usr/bin/env python
"""Materialize the at-rest dHash segment index (aux_data/media_index/<sf>)
for every testdata SF — the artifact ``incremental_image_dedup_probe``
reads so its registered shape is the O(batch) probe a deployment runs,
not an O(corpus) in-plan rebuild. Contents are exactly
``media_dhash_index``'s output (oracle-paired), so parity of the probe
query doubles as an artifact-freshness check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_iq_spark.queries.media import _img_index_df, _MEDIA_INDEX_DIR  # noqa: E402
from network_iq_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="build-media-index")
    spark.sparkContext.setLogLevel("WARN")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {sf}: no embeddings table")
            continue
        out = os.path.join(_MEDIA_INDEX_DIR, sf)
        _img_index_df(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{sf}: {n} index rows -> {out}")


if __name__ == "__main__":
    main()
