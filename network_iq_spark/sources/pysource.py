"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The engine's source tier is otherwise JVM formats (parquet/CSV/ORC/JSONL/
binaryFile/rate/kafka); this module covers the remaining seam — a source
whose LISTING AND READING logic itself is Python — with a deterministic
synthetic-telemetry generator:

    spark.dataSource.register(SyntheticTelemetry)
    df = (spark.read.format("niq_telemetry")
          .option("rows_per_partition", 1000)
          .option("n_partitions", 8)
          .option("seed", 42).load())

Why it earns its place: load-testing and soak corpora should be generated
INSIDE the scan (one seeded generator per input partition, streamed out in
Arrow batches) rather than driver-built with `createDataFrame` — the
driver path materializes the whole corpus in one process and caps out in
the tens of millions of rows, while a partitioned source scales with the
executor count like any other scan. Rows are a pure function of
(seed, partition, row index): same options → identical data on any
cluster layout, so generated corpora are reproducible evidence, not
one-off fixtures.

The API contract (used by tests as documentation):
- `partitions()` returns one `InputPartition` per planned split — Spark
  schedules one task per entry; parallelism is source-defined.
- `read(partition)` runs ON EXECUTORS; it must be self-contained
  (the generator state derives from the partition value, never from
  driver-side mutable state).
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EPOCH = datetime.datetime(2025, 1, 1)
_CELLS = 8


class _TelemetryPartition(InputPartition):
    def __init__(self, index: int, n_rows: int, seed: int) -> None:
        self.index = index
        self.n_rows = n_rows
        self.seed = seed


class SyntheticTelemetry(DataSource):
    """Deterministic telemetry generator as a first-class Spark source."""

    @classmethod
    def name(cls) -> str:
        return "niq_telemetry"

    def schema(self) -> str:
        return (
            "ts timestamp, cell_id string, latency_ms double, "
            "throughput_mbps double, part int"
        )

    def reader(self, schema) -> DataSourceReader:
        return _TelemetryReader(self.options)

    def simpleStreamReader(self, schema):
        return _TelemetryStreamReader(self.options)


class _TelemetryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        return [
            _TelemetryPartition(i, self.rows_per_partition, self.seed)
            for i in range(self.n_partitions)
        ]

    def read(self, partition: _TelemetryPartition):
        # executor-side: everything derives from (seed, partition, i) — a
        # splitmix-style integer hash, so no RNG object state to keep and
        # any row is recomputable in isolation (retry-stable)
        base = (partition.seed * 0x9E3779B97F4A7C15 + partition.index) & (2**64 - 1)
        for i in range(partition.n_rows):
            z = (base + i * 0xBF58476D1CE4E5B9) & (2**64 - 1)
            z ^= z >> 31
            ts = _EPOCH + datetime.timedelta(
                seconds=partition.index * partition.n_rows + i
            )
            yield (
                ts,
                f"CELL-{z % _CELLS:03d}",
                float(20 + (z >> 8) % 50),
                float(10 + (z >> 16) % 240),
                partition.index,
            )


class _TelemetryStreamReader:
    """Streaming face of the same generator (SimpleDataSourceStreamReader).

    The offset is the global row counter — a pure cursor into the
    deterministic row function — so `readBetweenOffsets` (the REPLAY path
    Structured Streaming invokes when a failed batch is recovered from the
    checkpoint) regenerates byte-identical rows for any committed range:
    exactly the property a source must have for end-to-end exactly-once.
    """

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, start: int, end: int):
        base = (self.seed * 0x9E3779B97F4A7C15) & (2**64 - 1)
        for i in range(start, end):
            z = (base + i * 0xBF58476D1CE4E5B9) & (2**64 - 1)
            z ^= z >> 31
            yield (
                _EPOCH + datetime.timedelta(seconds=i),
                f"CELL-{z % _CELLS:03d}",
                float(20 + (z >> 8) % 50),
                float(10 + (z >> 16) % 240),
                0,
            )

    def read(self, start: dict):
        # concrete list, not a generator: the prefetch machinery pickles
        # the returned rows to ship them into the planned batch
        end = {"row": start["row"] + self.rows_per_batch}
        return list(self._rows(start["row"], end["row"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(start["row"], end["row"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator has no retained state
