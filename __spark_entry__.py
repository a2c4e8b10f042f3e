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
# the queries with the least external verification first. After the r11
# window, stamps stand at 50 r11 / 50 r10 / 43 r9 / 44 r8 with exactly
# four sheet queries never driver-sampled. The r12 window = those four
# (r11-late additions; transform_dedup_census additionally grew two arms
# this round, so its stamp covers the r12 shape), the three NEW r12
# tiers (audio resample + video per-frame crop + video temporal
# resample), incremental_image_dedup_probe
# (r11 fallback-branch change, per the r11 verdict's ordering), the
# three decoded_jpeg* queries riding the r12 entropy-decode
# vectorization plus decoded_gif_stats (gained the codec-stage
# repartition in r12) and media_contract (probes the vectorized
# codecs), then the r8 cohort (oldest stamps). 4 + 3 + 1 + 3 + 2 = 13
# head slots + 37 of the 44 r8 queries = 50 exactly (jpeg420/prog are
# r8-stamped AND r12-touched, so they sit in the head, not the cohort
# count); the five alphabetically-last r8 queries (quality_scores,
# range_window_stats, scd2_user_type_history, warc_extract_stats,
# weighted_sample_per_source) overflow and lead r13. The r12
# _crop_verify frames-generalization and the _crop_candidates refactor
# leave the frames=1 plan byte-identical, so the r11-stamped crop
# queries keep their stamps.
_VERIFY_FIRST = [
    # never driver-sampled (r11-late additions)
    "image_thumbnail_pairs",
    "k_anonymity_customers",
    "image_rotated_dedup",
    "transform_dedup_census",
    # new in r12 (transform-matrix audio/video cells)
    "audio_resampled_near_dup_pairs",
    "video_cropped_near_dup_pairs",
    "video_resampled_near_dup_pairs",
    # code touched in r11/r12
    "incremental_image_dedup_probe",
    "decoded_jpeg_stats",
    "decoded_jpeg420_stats",
    "decoded_jpeg_prog_stats",
    "decoded_gif_stats",
    "media_contract",
    # the r8-stamped cohort (oldest external stamps in the sheet),
    # minus the two jpeg entries above and the five overflow entries
    "acctbal_quartiles",
    "acctbal_quartiles_scalable",
    "asof_last_purchase",
    "bpe_token_stats",
    "c4_line_filter",
    "cm_heavy_hitters",
    "contamination_check",
    "copurchase_triangles",
    "cosine_topk",
    "cube_order_stats",
    "customer_order_seq",
    "customers_with_orders",
    "delta_abs_p95",
    "doc_fingerprints",
    "doc_splits",
    "duplicate_spans",
    "embedding_label_stats",
    "embedding_near_dup",
    "events_in_windows",
    "ewma_hourly",
    "exact_dedup",
    "fertility_by_lang",
    "gopher_quality_flags",
    "hourly_gapfill",
    "incremental_quantile_refresh",
    "incremental_rollup_refresh",
    "ivf_cosine_topk",
    "jaccard_top_pairs",
    "kn_trigram_surprisal",
    "lang_id",
    "mad_outliers",
    "multimodal_features",
    "nation_activity_full_join",
    "orders_above_customer_avg",
    "part_type_setops",
    "pii_scan",
    "qty_price_correlation",
    # --- 50-slot window boundary ---
    # overflow, r13-priority order: the five r8 stamps that did not fit,
    # then the oldest-r9 cohort
    "quality_scores",
    "range_window_stats",
    "scd2_user_type_history",
    "warc_extract_stats",
    "weighted_sample_per_source",
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
