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
# the queries with the least external verification first: everything never
# yet sampled in CORRECTNESS_r1–r5, the one entry that ever failed a driver
# hash check (data_contract_events, fixed in fa26980, green locally since),
# and this round's additions. Ever-green queries fill the remaining slots in
# registration order.
_VERIFY_FIRST = [
    "data_contract_events",
    "training_data_pipeline_overlap",
    "unigram_surprisal",
    "chunk_dedup",
    "lang_sample_k",
    "vocab_coverage",
    "containment_top_pairs",
    "bigram_rarity",
    "semantic_dedup",
    "domain_mix_sample",
    "pii_redact",
    "quantized_cosine_topk",
    "chunk_manifest",
    "doc_keywords",
    "ann_int_cosine_topk",
    "winnowing_fingerprints",
    "winnow_overlap_pairs",
    "semantic_dedup_scaled",
    "salted_event_stats",
    "session_window_stats",
    "event_type_transitions",
    "weighted_discount",
    "shipping_priority",
    "nation_trade_volume",
    "parts_bought_together",
    "cast_coercion",
    "variant_props_stats",
    "contract_quarantine_summary",
    # round-6 additions
    "bucketed_order_lineitem",
    "time_sliced_rolling",
    "ann_multiprobe_topk",
    "decoded_image_stats",
    "ivf_centroid_join_topk",
    "tfidf_top_terms",
    "term_postings",
    "grouping_sets_revenue",
    "lateral_top_orders",
    "recursive_copurchase_reach",
    "incremental_exact_dedup",
    "incremental_near_dup",
    "embedding_drift",
    "vocab_drift_top_movers",
    "span_corruption_manifest",
    "incremental_ann_topk",
    "ann_int_multiprobe_topk",
    "ab_test_conversion",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _VERIFY_FIRST if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from network_iq_spark.registry import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    from network_iq_spark.registry import ORACLES

    return _ordered(dict(ORACLES))
