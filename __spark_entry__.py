"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke check);
``queries()`` / ``oracle_sql()`` expose the full operator registry
(``network_iq_spark/queries/``) cross-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from network_iq_spark.registry import QUERIES

    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


# The driver hash-checks a 50-query prefix of this dict per round. Surface
# the queries with the least external verification first. Round 10
# FINISHES the rotation: the 31 r6-stamped overflow queries (ordered
# exactly as the r9 window left them) drain the last pre-r7 stamps; then
# the queries whose code r10 touched — seven new oracle-paired additions
# (capped chunk LSH, the media index build + at-rest-index probe shape,
# chunk BM25, incremental chunk near-dup, chunk-overlap admission,
# packing-strategy report), the two whose expressions changed (chunk-id
# overflow guard; incremental_image_dedup's helper extraction), and the
# six riding hamming_blocked_pairs (which gained the max_bucket_size
# seam; default path byte-identical, the external hash re-proves it —
# incl. the new capped image twin); then oldest-r7 fills. After this
# window samples green, NO sheet stamp predates r7 and steady-state
# rotation (50/round over ~180) keeps every stamp <= 4 rounds old.
_VERIFY_FIRST = [
    # the 31 r6-stamped overflow queries — the last pre-r7 stamps
    "ann_int_multiprobe_topk",
    "bucketed_order_lineitem",
    "calendar_features",
    "cast_coercion",
    "chunk_manifest",
    "contract_quarantine_summary",
    "data_contract_events",
    "decoded_image_stats",
    "distinct_users_head",
    "domain_mix_sample",
    "embedding_drift",
    "event_type_transitions",
    "grouped_quantile",
    "grouping_sets_revenue",
    "incremental_ann_topk",
    "ivf_centroid_join_topk",
    "lang_sample_k",
    "lateral_top_orders",
    "nation_trade_volume",
    "ordered_preview",
    "parts_bought_together",
    "pii_redact",
    "quantized_cosine_topk",
    "salted_event_stats",
    "session_window_stats",
    "shipping_priority",
    "span_corruption_manifest",
    "time_sliced_rolling",
    "training_data_pipeline_overlap",
    "variant_props_stats",
    "weighted_discount",
    # r10 additions (never driver-sampled)
    "chunk_near_dup_pairs_capped",
    "media_dhash_index",
    "incremental_image_dedup_probe",
    "chunk_bm25_topk",
    "incremental_chunk_near_dup",
    "chunk_overlap_admission",
    "packing_efficiency",
    # expressions changed this round (values identical by construction;
    # the external hash re-proves it): chunk-id guard, helper extraction
    "chunk_near_dup_pairs",
    "incremental_image_dedup",
    # hamming_blocked_pairs consumers (max_bucket_size seam added r10;
    # default path unchanged) + the new capped image twin
    "image_near_dup_pairs",
    "image_near_dup_pairs_capped",
    "audio_near_dup_pairs",
    "video_near_dup_pairs",
    "media_near_dup_census",
    "image_dedup_clusters",
    # oldest-r7 fills
    "vocab_drift_top_movers",
    "sessionize",
    "decoded_png_stats",
    "decoded_jpeg_stats",
    # --- 50-slot window boundary ---
    # overflow, in r11-priority order: the remaining r7-stamped queries
    "decoded_audio_stats",
    "decoded_video_stats",
    "cluster_keep_best",
    "html_extract",
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "ann_ivfpq_topk",
    "order_snapshot_diff",
    "url_canonical_dedup",
    "quality_psi_drift",
    "lsh_quality_report",
    "group_safe_splits",
    "bpe_train_merges",
    "centered_mavg_volume",
    "customers_without_orders",
    "dedup_keep_last",
    "event_type_domains",
    "hourly_baseline",
    "hourly_compare_unpivot",
    "hourly_profile",
    "json_props_stats",
    "kpi_cards",
    "latest_snapshot",
    "minmax_norm",
    "nation_supplier_balance",
    "order_line_rollup",
    "risky_hours",
    "rolling_features",
    "zscore_top_anomalies",
    "brand_top_parts",
    "order_priority_stats",
    "regional_revenue",
    "segment_acctbal_stats",
    "cohort_retention",
    "funnel_steps",
    "hourly_type_pivot",
    "pricing_summary",
    "top_revenue_customers",
    "dedup_clusters",
    "sequence_packing",
    "simhash60_pairs",
    "stratified_sample_counts",
    "training_data_pipeline",
    "recursive_copurchase_reach",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _VERIFY_FIRST if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Excludes ``BENCH_ONLY`` queries (float-valued approximate structures
    that are rows-only by design); each has an oracle-paired exact or
    integer-quantized twin in the sheet, and all stay covered by bench.py
    and the local test suite.
    """
    from network_iq_spark.registry import BENCH_ONLY, QUERIES

    return _ordered({k: v for k, v in QUERIES.items() if k not in BENCH_ONLY})


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    from network_iq_spark.registry import BENCH_ONLY, ORACLES

    return _ordered({k: v for k, v in ORACLES.items() if k not in BENCH_ONLY})
