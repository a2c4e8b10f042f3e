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
# the queries with the least external verification first. The r10 rotation
# drain left every stamp at r7+ (44 r7 / 46 r8 / 43 r9 / 50 r10); the r11
# window = the four queries that have NEVER been driver-sampled (the new
# crop tier + its incremental probe and the two newly oracle-paired
# shifted tiers), the two riding the r11 GIF codec vectorization
# (decoded_gif_stats, media_contract), then the ENTIRE 44-query r7
# cohort (oldest stamps). 4 + 2 + 44 = 50 exactly — after this window
# samples green, no stamp predates r8 and steady-state rotation
# (50/round over ~187) keeps every stamp <= 4 rounds old.
# (incremental_image_dedup_probe also changed in r11, but only its
# missing-artifact FALLBACK branch — the committed aux_data index exists
# at driver time, so the executed plan is identical to its green r10
# stamp; the fallback is covered by the local test. It leads the
# overflow instead of displacing an r7 re-stamp.)
_VERIFY_FIRST = [
    # never driver-sampled (new in r11)
    "image_cropped_near_dup_pairs",
    "incremental_image_crop_probe",
    "audio_shifted_near_dup_pairs",
    "video_frame_shifted_pairs",
    # code touched in r11
    "decoded_gif_stats",
    "media_contract",
    # the full r7-stamped cohort (oldest external stamps in the sheet)
    "ann_ivfpq_topk",
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "bpe_train_merges",
    "brand_top_parts",
    "centered_mavg_volume",
    "cluster_keep_best",
    "cohort_retention",
    "customers_without_orders",
    "decoded_audio_stats",
    "decoded_video_stats",
    "dedup_clusters",
    "dedup_keep_last",
    "event_type_domains",
    "funnel_steps",
    "group_safe_splits",
    "hourly_baseline",
    "hourly_compare_unpivot",
    "hourly_profile",
    "hourly_type_pivot",
    "html_extract",
    "json_props_stats",
    "kpi_cards",
    "latest_snapshot",
    "lsh_quality_report",
    "minmax_norm",
    "nation_supplier_balance",
    "order_line_rollup",
    "order_priority_stats",
    "order_snapshot_diff",
    "pricing_summary",
    "quality_psi_drift",
    "recursive_copurchase_reach",
    "regional_revenue",
    "risky_hours",
    "rolling_features",
    "segment_acctbal_stats",
    "sequence_packing",
    "simhash60_pairs",
    "stratified_sample_counts",
    "top_revenue_customers",
    "training_data_pipeline",
    "url_canonical_dedup",
    "zscore_top_anomalies",
    # --- 50-slot window boundary ---
    # overflow, r12-priority order: the one r11 addition that did not
    # fit the window (the r7 cohort outranked it per the r10 verdict's
    # item 6; locally oracle-replayed green, r12 stamps it), then the
    # r11 fallback-branch change and operator-module churn, then
    # oldest-r8 stamps
    "image_thumbnail_pairs",
    "k_anonymity_customers",
    "image_rotated_dedup",
    "transform_dedup_census",
    "incremental_image_dedup_probe",
    "simhash_pairs",
    "simhash_pairs_blocked",
    "media_dhash_index",
    "chunk_overlap_admission",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_prod",
    "jaccard_top_pairs",
    "doc_fingerprints",
    "image_near_dup_pairs",
    "audio_near_dup_pairs",
    "video_near_dup_pairs",
    "media_near_dup_census",
    "image_dedup_clusters",
    "contamination_check",
    "decontamination_spans",
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
