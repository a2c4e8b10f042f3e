"""Scalable global ranking — row_number / ntile over a TOTAL order without
the single-partition global window.

``Window.orderBy(...)`` with no partition key moves every row to one
reducer (`WindowExec: No Partition Defined`) — correct, but a hard
bottleneck at 100 TB.  The classic scale-out shape used here instead:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the sort key —
   each partition holds a contiguous, disjoint key range, locally sorted
   (one shuffle total; RangePartitioner boundary sampling is seeded
   deterministically per partition index).
2. ``monotonically_increasing_id()`` over the sorted partitions: the id's
   documented layout is ``(partition_id << 33) | row_index``, so BOTH the
   partition id and the local 1-based rank fall out of one narrow
   projection — no Window, no second exchange (a Window partitioned by
   ``spark_partition_id()`` would force a redundant hash shuffle because
   Catalyst can't see that range partitioning already satisfies it).
3. per-partition row counts → offsets.  Materialized path: the counts
   (≤ #partitions rows — bytes, not data) are collected to the driver,
   prefix-summed, and attached as an array-literal projection — zero
   joins after the checkpoint.  Lazy path: a triangular broadcast
   self-join over the counts, broadcast back.
4. ``global_rank = partition_offset + local_rank``.

The order columns must form a TOTAL order (add a unique tiebreak column);
ties straddling a range boundary would otherwise make ranks
partition-dependent.  ``ntile`` then derives bucket ids arithmetically
from the global rank with SQL NTILE's exact fill semantics (first
``N % k`` buckets get the extra row).  Limit: < 2^33 rows per partition
(the id layout), i.e. size partitions sanely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__rank_pid__"
_LRN = "__rank_local__"
_OFF = "__rank_offset__"
_TOT = "__rank_total__"


def _order_cols(order: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order]


def global_row_number(
    df: DataFrame,
    order: Sequence[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
    _keep_total: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Global 1-based row_number over a total order, fully partitioned.

    Result-equivalent to ``row_number().over(Window.orderBy(*order))`` but
    never concentrates the table on one reducer; the only single-partition
    work is the running sum over the per-partition COUNTS (one row per
    partition).
    """
    cols = _order_cols(order)
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    mid = "__rank_mid__"
    local = (
        df.repartitionByRange(int(parts), *cols)
        .sortWithinPartitions(*cols)
        .withColumn(mid, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(mid), 33))
        .withColumn(
            _LRN, F.col(mid).bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
        )
        .drop(mid)
    )
    # TWO consumers (the per-partition counts and the final rank) with
    # different column prunings — without materialization the range
    # shuffle + sort executes twice (Catalyst can't ReuseExchange across
    # differing projections). One shuffle-sized localCheckpoint is the
    # honest cost; it also pins the partition→id assignment so both
    # consumers provably see the SAME ranking. materialize=False keeps the
    # plan inspectable (plan-shape tests) at the price of the double run.
    if materialize:
        # eager=False: the counts collect below is the materializing
        # action, so the checkpoint write and the per-partition counts
        # happen in ONE job instead of two.
        local = local.localCheckpoint(eager=False)
        # The checkpoint makes this path eager anyway, so fuse the offset
        # computation into the driver: collect the per-partition COUNTS
        # (≤ #partitions rows — bytes by construction), prefix-sum in
        # Python, and attach offsets as a pure array-literal projection.
        # Saves jobs and two broadcast exchanges vs the lazy formulation
        # below — the whole tail of the rank is then a single scan of the
        # in-memory checkpoint with zero joins.
        cnt = {
            r[_PID]: r["__cnt__"]
            for r in local.groupBy(_PID)
            .agg(F.count(F.lit(1)).alias("__cnt__"))
            .collect()
        }
        offs, acc = [], 0
        for p in range(int(parts)):
            offs.append(acc)
            acc += cnt.get(p, 0)
        off_arr = F.array(*[F.lit(o) for o in offs])
        # bigint, not int: a global rank tops out at the TABLE's row
        # count — 32-bit would overflow (or throw under ANSI) past 2^31-1
        # rows, which a 100 TB fact table exceeds by orders of magnitude
        ranked = local.withColumn(
            out,
            (
                F.element_at(off_arr, F.col(_PID).cast("int") + 1)
                + F.col(_LRN)
            ).cast("bigint"),
        )
        if _keep_total:
            ranked = ranked.withColumn(_TOT, F.lit(acc).cast("bigint"))
        return ranked.drop(_PID, _LRN)
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt__"))
    # cumulative offsets via a triangular broadcast self-join over the
    # per-partition COUNTS (≤ #partitions rows — bytes).  A running-sum
    # window would need a constant partition key, which Catalyst
    # constant-folds away, re-introducing the unpartitioned WindowExec.
    prior = counts.select(
        F.col(_PID).alias("__p2__"), F.col("__cnt__").alias("__c2__")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("__p2__") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(F.coalesce(F.sum("__c2__"), F.lit(0)).alias(_OFF))
    )
    joined = local.join(F.broadcast(offsets), _PID).withColumn(
        out, (F.col(_OFF) + F.col(_LRN)).cast("bigint")
    )
    if _keep_total:
        total = counts.agg(F.sum("__cnt__").alias(_TOT))
        joined = joined.crossJoin(F.broadcast(total))
    return joined.drop(_PID, _LRN, _OFF)


def ntile_scalable(
    df: DataFrame,
    n: int,
    order: Sequence[str | Column],
    out: str = "bucket",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """SQL ``NTILE(n) OVER (ORDER BY ...)`` without the global window.

    Exact NTILE fill: with N rows, ``q = N div n``, ``r = N mod n``, the
    first ``r`` buckets hold ``q+1`` rows.  Bucket of global rank ``i``::

        i <= r·(q+1)  →  ceil(i / (q+1))
        otherwise     →  r + ceil((i − r·(q+1)) / q)
    """
    rn = "__rank_rn__"
    ranked = global_row_number(
        df, order, out=rn, num_partitions=num_partitions, _keep_total=True,
        materialize=materialize,
    )
    i, tot = F.col(rn).cast("bigint"), F.col(_TOT)
    q = (tot / n).cast("bigint")
    r = tot % n
    head = r * (q + 1)
    bucket = F.when(i <= head, F.ceil(i / (q + 1))).otherwise(
        r + F.ceil((i - head) / q)
    )
    return ranked.withColumn(out, bucket.cast("int")).drop(rn, _TOT)
