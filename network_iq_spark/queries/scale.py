"""Scale-tier (approximate) queries — the 100 TB siblings of the exact
operators. Sketch-based results differ from any SQL oracle by design, so
these register WITHOUT oracles (the driver records the weaker rows-only
check; the exact twins carry the correctness burden).

- ``approx_profile``: HLL distinct counts + t-digest-style quantiles — the
  mergeable-sketch versions of A2/A10 (single pass, no per-group sort, no
  exact-distinct shuffle explosion).
- ``ann_cosine_topk``: LSH-bucketed approximate nearest neighbours — the
  scale path next to the exact ``cosine_topk`` baseline (brute force only
  inside matching hyperplane-signature buckets).
- ``salted_event_stats`` (oracle-backed, exact): the skew-proof two-phase
  aggregate — bit-identical to the plain groupBy because sums ride the
  integer-unit path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from network_iq_spark.operators import similarity as S
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table


@register("approx_profile")
def q_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type: approx distinct users (HLL++,
    rsd 1%) and approx P50/P95 (percentile_approx, accuracy 10k)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(10000)).alias(
                "approx_median"
            ),
            F.percentile_approx(F.col("value"), F.lit(0.95), F.lit(10000)).alias(
                "approx_p95"
            ),
        )
        .orderBy("event_type")
    )


@register("ann_cosine_topk")
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-10 for query vectors (vec_id < 10): candidates
    share a bucket in any of 16 4-plane random-hyperplane tables; exact cosine only inside
    buckets. Recall < 1 by construction (see tests for the measured figure);
    multi-probe or more tables raise it."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", S.as_double_vec("embedding").alias("v"))
    queries = vecs.select("vec_id").filter(F.col("vec_id") < 10)
    return S.cosine_topk_lsh(vecs, queries, dim=64, k=10).orderBy(
        "q_vec_id", "rank"
    )


@register(
    "salted_event_stats",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_value,
           COUNT(value) AS count_value,
           CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / (10000.0 * COUNT(value)) AS avg_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregate as a driver-facing query: 100k events
    over 5 hot event_type keys is exactly the one-reducer-per-hot-key shape
    AQE cannot fix for aggregations. Phase 1 spreads each key over 16 salts;
    phase 2 merges partials — and because sums ride the exact integer-unit
    path, the result is BIT-IDENTICAL to the plain one-phase groupBy the
    oracle runs (float sums would drift in ulps under the salt regrouping;
    operators/skew.py salted_sum_count)."""
    from network_iq_spark.operators.skew import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    return salted_sum_count(ev, ["event_type"], "value", n_salts=16).orderBy(
        "event_type"
    )
