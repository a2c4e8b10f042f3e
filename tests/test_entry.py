"""t1 smoke: the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_registry_entry():
    qs = e.queries()
    assert "pricing_summary" in qs
    # every oracle key must correspond to a query
    assert set(e.oracle_sql()) <= set(qs)


def test_cli_catalog_list_and_run(spark):
    """--list prints every registered query; --run parses args (exercised
    in-process to avoid a second JVM)."""
    from network_iq_spark.__main__ import _catalog_main
    from network_iq_spark.registry import QUERIES

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _catalog_main(["--list"])
    out = buf.getvalue()
    for name in QUERIES:
        assert name in out
    assert f"{len(QUERIES)} queries" in out

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _catalog_main(["--run", "not_a_query"])


def test_verify_first_names_all_resolve():
    """Every name in the driver-sheet rotation list must exist in the
    (bench-only-filtered) sheet — a typo would silently drop a query out
    of the externally-verified window instead of failing loudly."""
    qs = e.queries()
    missing = [n for n in e._VERIFY_FIRST if n not in qs]
    assert not missing, missing
    # the sheet is 100% oracle-paired (bench-only queries are filtered out)
    assert set(e.oracle_sql()) == set(qs)
    # the r13 window (r12 verdict item 1): the five r8-stamped stragglers
    # lead, then transform_dedup_census (r12 stamp covers the 5-arm shape,
    # HEAD ships more arms), then the full oldest-r9 cohort; new r13 tiers
    # slot in after the census as they land, displacing the tail
    window = list(qs)[:50]
    assert window[:12] == [
        "quality_scores", "range_window_stats", "scd2_user_type_history",
        "warc_extract_stats", "weighted_sample_per_source",
        "transform_dedup_census", "audio_trimmed_near_dup_pairs",
        "incremental_resample_probe", "incremental_trim_probe",
        "video_trimmed_near_dup_pairs", "image_transform_resolution",
        "multimodal_features",
    ]
    r9_cohort = [
        "ab_test_conversion", "ann_int_cosine_topk", "bigram_rarity",
        "bm25_topk", "bm25_topk_capped", "chunk_dedup",
        "containment_top_pairs", "dataset_card", "decontamination_spans",
        "doc_keywords", "hard_negatives_topk", "incremental_exact_dedup",
        "incremental_near_dup", "ivf_int_recenter_stats",
        "minhash_lsh_pairs", "minhash_lsh_pairs_capped",
        "minhash_lsh_pairs_prod", "mixture_sample_counts", "packing_ffd",
        "related_docs_rrf", "related_docs_rrf_dense", "repetition_stats",
        "rolling_fingerprints", "rollup_order_counts",
        "scope_filtered_profile", "semantic_dedup", "simhash_pairs",
        "simhash_pairs_blocked", "supplier_pagerank",
        "temperature_mix_weights", "term_postings", "tfidf_top_terms",
        "time_weighted_avg", "token_stats", "unigram_surprisal",
        "union_label_dims", "value_autocorr_lag1",
        "value_equidepth_histogram",
    ]
    # the five alphabetically-last r9 entries (value_histogram,
    # vocab_coverage, winnow_overlap_pairs, winnowing_fingerprints,
    # winsorized_profile) displaced into the overflow by the five new
    # r13 tiers + the touched multimodal_features — they keep their r9
    # stamps and lead the r14 list
    assert window[12:50] == r9_cohort
