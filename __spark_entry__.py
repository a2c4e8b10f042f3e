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
# the queries with the least external verification first. After the r13
# window, stamps stand at 50 r13 / 48 r12 / 48 r11 / 48 r10 / 5 r9 with
# every oracle-paired query externally stamped at least once. The r14
# window (per the r13 verdict's committed overflow order): the five
# r9-stamped stragglers lead, then the seven NEW r14 queries (the
# audio/video cross-axis resolutions, the three per-modality keep-best
# policies, the trim∘gain composed tier, and the admission manifest),
# then the r14-TOUCHED queries — FIRST the five whose bench-SF executed
# plan CHANGED (the min_bytes guards: token_stats, doc_fingerprints,
# ivf_int_recenter_stats, and the two resample tiers — the r13
# multimodal_features precedent: a guard is a plan change and leads the
# window), THEN the plan-identical helper refactors (image arms +
# image_transform_resolution from r14a; the audio trim / video crop /
# video trim arms whose twin plants moved into the shared helpers the
# keep-best member corpora consume) and the artifact-root-gated probes.
# Then (r14 optimization rounds) the queries whose executed plan the
# optimization commits CHANGED — the CC-convergence consumers
# (dedup_clusters, image_dedup_clusters, cluster_keep_best), the graph
# rewrites (supplier_pagerank, copurchase_triangles), the window-dedup
# pipeline pair, the shared-tokenize retrieval pair + bm25_topk, the
# map-side capped tiers (jaccard/containment_top_pairs) and the
# walk-prefix-sum audio tier (audio_shifted_near_dup_pairs) — results
# oracle-pinned locally, fresh external stamps prioritized over
# refreshing unchanged r10 stamps. The remaining slots take the
# oldest-r10 cohort alphabetically; the displaced r10 entries keep
# their r10 stamps and lead the committed r15 overflow.
# (r14 optimization update: transform_dedup_census JOINED the window —
# the shared-source arm composition and the lambda-form crop verify
# changed its executed plan, so the "stays out" rationale below no
# longer holds; it displaced chunk_overlap_admission to the overflow
# head.) Original mid-build rationale — transform_dedup_census stays
# out: its 8-arm composition
# is unchanged (the composed trim∘gain axis lives on the resolution/
# admission surface, not in the matrix census) and the arm refactors
# are plan-identical, pinned by the arms' own re-stamps. The r14 jpeg
# edit (assert → RuntimeError on an internal-constants invariant) is
# guarded-input-only — the r13 rule — so decoded_jpeg* stamps remain
# representative.
_VERIFY_FIRST = [
    "value_histogram",
    "vocab_coverage",
    "winnow_overlap_pairs",
    "winnowing_fingerprints",
    "winsorized_profile",
    "audio_transform_resolution",
    "video_transform_resolution",
    "image_resolution_keep_best",
    "audio_resolution_keep_best",
    "video_resolution_keep_best",
    "audio_trim_gain_pairs",
    "transform_admission_manifest",
    "token_stats",
    "doc_fingerprints",
    "ivf_int_recenter_stats",
    "audio_resampled_near_dup_pairs",
    "video_resampled_near_dup_pairs",
    "image_cropped_near_dup_pairs",
    "image_thumbnail_pairs",
    "image_rotated_dedup",
    "image_transform_resolution",
    "audio_trimmed_near_dup_pairs",
    "video_cropped_near_dup_pairs",
    "video_trimmed_near_dup_pairs",
    "incremental_resample_probe",
    "incremental_trim_probe",
    "incremental_image_dedup_probe",
    # r14 OPTIMIZATION-touched (plan changed this round, results
    # oracle-pinned locally — fresh external stamps take priority over
    # refreshing unchanged r10 stamps): the CC-convergence consumers,
    # the graph/pipeline rewrites, the shared-tokenize retrieval pair,
    # and the map-side capped tiers.
    "dedup_clusters",
    "image_dedup_clusters",
    "cluster_keep_best",
    "supplier_pagerank",
    "copurchase_triangles",
    "training_data_pipeline",
    "training_data_pipeline_overlap",
    "related_docs_rrf",
    "related_docs_rrf_dense",
    "bm25_topk",
    "jaccard_top_pairs",
    "containment_top_pairs",
    "audio_shifted_near_dup_pairs",
    "transform_dedup_census",
    "ann_int_multiprobe_topk",
    "audio_near_dup_pairs",
    "bucketed_order_lineitem",
    "calendar_features",
    "cast_coercion",
    "chunk_bm25_topk",
    "chunk_manifest",
    "chunk_near_dup_pairs",
    "chunk_near_dup_pairs_capped",
    # --- 50-slot window boundary ---
    # overflow, r15-priority order: the displaced r10 entries, then
    # the r11 cohort, alphabetical
    "chunk_overlap_admission",
    "contract_quarantine_summary",
    "data_contract_events",
    "decoded_image_stats",
    "decoded_png_stats",
    "distinct_users_head",
    "domain_mix_sample",
    "embedding_drift",
    "event_type_transitions",
    "grouped_quantile",
    "grouping_sets_revenue",
    "image_near_dup_pairs",
    "image_near_dup_pairs_capped",
    "incremental_ann_topk",
    "incremental_chunk_near_dup",
    "incremental_image_dedup",
    "ivf_centroid_join_topk",
    "lang_sample_k",
    "lateral_top_orders",
    "media_dhash_index",
    "media_near_dup_census",
    "nation_trade_volume",
    "ordered_preview",
    "packing_efficiency",
    "parts_bought_together",
    "pii_redact",
    "quantized_cosine_topk",
    "salted_event_stats",
    "session_window_stats",
    "sessionize",
    "shipping_priority",
    "span_corruption_manifest",
    "time_sliced_rolling",
    "variant_props_stats",
    "video_near_dup_pairs",
    "vocab_drift_top_movers",
    "weighted_discount",
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
