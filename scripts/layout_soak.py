#!/usr/bin/env python
"""Measured file-skipping rates per physical layout (docs/SCALE.md evidence).

The clustering story so far was argued from mechanism: lexicographic sort
clusters only its leading column; a Morton/Z-order code gives every file a
compact envelope in EVERY clustering column, so manifest-driven pruning
(`parquet_file_manifest` + `pruned_parquet_read` — the Iceberg/Delta
structure) skips files for predicates on ANY of them. This script turns
that into numbers: one synthetic 2-column uniform table, three layouts
(random, ORDER BY a,b, Z-order), identical predicates, measured
files-kept fractions.

Run: python scripts/layout_soak.py   (writes under .soak/, gitignored)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 2_000_000
N_FILES = 32
SOAK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".soak", "layout"
)


def main() -> None:
    from pyspark.sql import functions as F

    from network_iq_spark.session import get_spark
    from network_iq_spark.sources.maintenance import (
        parquet_file_manifest,
        pruned_parquet_read,
        zorder_write,
    )

    spark = get_spark(app_name="layout-soak")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SOAK, ignore_errors=True)

    # two independent uniform dimensions — the worst case for 1-D sorting
    # and the textbook case for space-filling curves
    df = spark.range(ROWS).select(
        (F.hash(F.col("id"), F.lit(1)).cast("double") / 2147483647.0 * 500 + 500)
        .cast("bigint")
        .alias("a"),
        (F.hash(F.col("id"), F.lit(2)).cast("double") / 2147483647.0 * 500 + 500)
        .cast("bigint")
        .alias("b"),
        F.col("id").alias("payload"),
    )

    paths = {
        "random": os.path.join(SOAK, "random"),
        "lexicographic (a, b)": os.path.join(SOAK, "lex"),
        "z-order (a, b)": os.path.join(SOAK, "zorder"),
    }
    df.repartition(N_FILES).write.parquet(paths["random"])
    (
        df.repartitionByRange(N_FILES, "a", "b")
        .sortWithinPartitions("a", "b")
        .write.parquet(paths["lexicographic (a, b)"])
    )
    zorder_write(df, paths["z-order (a, b)"], ["a", "b"], n_files=N_FILES)

    # ~10%-selectivity windows per dimension; 2-D box is ~1% of the space
    preds = {
        "a in [700, 750)": {"a": (700, 749)},
        "b in [700, 750)": {"b": (700, 749)},
        "a AND b in [700, 750)": {"a": (700, 749), "b": (700, 749)},
    }
    print("| layout | " + " | ".join(preds) + " |")
    print("|---|" + "---|" * len(preds))
    for label, path in paths.items():
        man = parquet_file_manifest(spark, path, ["a", "b"]).localCheckpoint()
        cells = []
        for ranges in preds.values():
            sub, kept, total = pruned_parquet_read(spark, man, ranges)
            # sanity: pruning is sound — row count matches the full scan
            want = spark.read.parquet(path)
            for c, (lo, hi) in ranges.items():
                want = want.filter((F.col(c) >= lo) & (F.col(c) <= hi))
                sub = sub.filter((F.col(c) >= lo) & (F.col(c) <= hi))
            assert sub.count() == want.count(), (label, ranges)
            cells.append(f"{kept}/{total} files")
        print(f"| {label} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
