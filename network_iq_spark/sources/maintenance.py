"""Table maintenance: compaction and clustering.

At 100 TB the killer operational problem is small files: hourly streaming
micro-batches × partitions × tasks produce millions of KB-sized parquet
files, and scan-task scheduling overhead dominates I/O. Two remedies:

- **Compaction**: rewrite a partition's files to a target count. Runs per
  partition (bounded work, safe to parallelize across partitions), writes
  to a temp dir then swaps — readers never see a half-written partition.
- **Clustering**: ``sortWithinPartitions`` on high-selectivity columns
  before writing, so parquet row-group min/max stats become selective and
  predicate pushdown can skip row groups (poor-man's Z-order; real
  multi-dimensional clustering would interleave key bits the same way).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    cluster_by: Sequence[str] = (),
) -> tuple[int, int]:
    """Rewrite one parquet directory to ``target_files`` files (optionally
    clustered). Returns (files_before, files_after).

    Write-to-temp-then-swap keeps the directory readable throughout; on a
    real deployment the swap is a metastore/table-format pointer flip
    (Iceberg/Delta commit) rather than a filesystem rename.
    """

    def _count(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = _count(path)
    df = spark.read.parquet(path)
    if cluster_by:
        # range-partition on the cluster keys so each output file covers a
        # NARROW key range (hash repartition would scatter every key into
        # every file and the row-group stats would span the full domain)
        df = df.repartitionByRange(target_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.coalesce(target_files)
    tmp = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")))
    df.write.mode("overwrite").parquet(tmp)
    swap = path.rstrip("/") + ".old"
    os.rename(path.rstrip("/"), swap)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(swap)
    return before, _count(path)
