"""Streaming incremental-view maintenance: log-structured monoid state.

The batch IVM tier (sources/maintenance.py ``rollup_state`` /
``merge_rollup_states``) keeps a rollup as a mergeable monoid state. Its
streaming twin CANNOT simply fold each micro-batch into the state table:
foreachBatch is at-least-once, and a fold is not idempotent — replaying a
batch would double-count it (the keyed-upsert trick of ``sink.py`` works
there because upsert IS idempotent; merge is not).

The fix is log-structured: each micro-batch writes its PARTIAL state to
its own ``_batch_id=N`` partition with dynamic partition overwrite, so a
replay rewrites the same directory instead of folding twice — idempotence
recovered at the storage layer, not the algebra. The queryable state is
the monoid merge over partials at read time, and a maintenance-window
``compact_rollup_state`` folds the log into one base partial (safe at any
moment: the merge is associative, so (base ⊕ p1 ⊕ p2) ≡ ((base ⊕ p1) ⊕ p2)
by the same law the oracle equality of ``incremental_rollup_refresh``
proves).

100 TB posture: per-epoch cost is O(batch keys) — one combinable groupBy
of the batch plus one partition-scoped write; nothing ever re-reads the
fact stream or the full state. Read cost grows with the number of
uncompacted partials (each is key-grain, tiny); compaction cadence bounds
it — exactly the LSM shape every streaming-warehouse state store uses.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def rollup_state_sink(
    path: str,
    keys: Sequence[str],
    value_col: str = "value",
    scale: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: micro-batch → partial rollup state
    at ``_batch_id=<epoch>``. Replays of any epoch converge (dynamic
    partition overwrite rewrites, never appends)."""
    from network_iq_spark.sources.maintenance import ROLLUP_SCALE, rollup_state

    sc = ROLLUP_SCALE if scale is None else scale

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        partial = rollup_state(batch_df, keys, value_col, sc).withColumn(
            "_batch_id", F.lit(int(batch_id))
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            partial.write.mode("overwrite").partitionBy("_batch_id").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return sink


def read_rollup_state(
    spark: SparkSession, path: str, keys: Sequence[str]
) -> DataFrame:
    """The queryable state: monoid merge over all at-rest partials. One
    combinable groupBy over key-grain rows — partial-count × key-count,
    never fact rows."""
    from network_iq_spark.sources.maintenance import merge_rollup_states

    return merge_rollup_states([spark.read.parquet(path).drop("_batch_id")], keys)


def compact_rollup_state(
    spark: SparkSession, path: str, keys: Sequence[str]
) -> None:
    """Fold the partial log into a single base partial (``_batch_id=-1``).
    Readers before/after see identical state (associativity); the write
    breaks lineage via localCheckpoint because it overwrites directories
    the plan read (the upsert_partitioned idiom)."""
    from pyspark.sql import functions as F

    merged = (
        read_rollup_state(spark, path, keys)
        .withColumn("_batch_id", F.lit(-1))
        .localCheckpoint()
    )
    # force STATIC overwrite: under a session-level dynamic mode this write
    # would only replace _batch_id=-1 and leave the old partials in place —
    # every read after that would double-count the history
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        merged.write.mode("overwrite").partitionBy("_batch_id").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def monoid_state_sink(
    path: str,
    state_fn,  # Callable[[DataFrame], DataFrame]: batch → partial state
) -> Callable[[DataFrame, int], None]:
    """Generalized log-structured sink: any monoid state builder (the
    rollup state, a histogram_state, a cm_sketch_state — anything whose
    merge is a groupBy-SUM/MIN/MAX over its own output) gets the same
    replay-idempotent storage shape: per-epoch partials at
    ``_batch_id=N`` under dynamic overwrite. The read side merges with
    the state family's own merge function; compaction is
    ``compact_monoid_state`` with the same merge."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        partial = state_fn(batch_df).withColumn("_batch_id", F.lit(int(batch_id)))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            partial.write.mode("overwrite").partitionBy("_batch_id").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return sink


def read_monoid_state(
    spark: SparkSession, path: str, merge_fn
) -> DataFrame:
    """Queryable state for a generalized sink: ``merge_fn`` is the state
    family's own fold (e.g. ``merge_histogram_states`` /
    ``merge_cm_states``), applied to the at-rest partial log."""
    return merge_fn([spark.read.parquet(path).drop("_batch_id")])


def compact_monoid_state(spark: SparkSession, path: str, merge_fn) -> None:
    """Fold the partial log down to one base partial with the family's own
    merge (associativity makes any compaction moment safe); STATIC
    overwrite for the same reason as ``compact_rollup_state``."""
    from pyspark.sql import functions as F

    merged = (
        read_monoid_state(spark, path, merge_fn)
        .withColumn("_batch_id", F.lit(-1))
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        merged.write.mode("overwrite").partitionBy("_batch_id").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
