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
    # the r12 window: the four r11-late never-sampled queries lead
    # (transform_dedup_census in its r12 five-arm shape), then the two
    # NEW r12 transform cells, the r11-fallback-touched incremental
    # probe, the five codec queries riding the r12 entropy-decode
    # vectorization / codec-stage repartition (decoded_jpeg* x3,
    # decoded_gif_stats, media_contract), then 37 of the 44-query r8
    # cohort (the five alphabetically-last overflow to r13)
    window = list(qs)[:50]
    assert window[:13] == [
        "image_thumbnail_pairs", "k_anonymity_customers",
        "image_rotated_dedup", "transform_dedup_census",
        "audio_resampled_near_dup_pairs", "video_cropped_near_dup_pairs",
        "video_resampled_near_dup_pairs",
        "incremental_image_dedup_probe", "decoded_jpeg_stats",
        "decoded_jpeg420_stats", "decoded_jpeg_prog_stats",
        "decoded_gif_stats", "media_contract",
    ]
    r8_cohort = [
        "acctbal_quartiles", "acctbal_quartiles_scalable",
        "asof_last_purchase", "bpe_token_stats", "c4_line_filter",
        "cm_heavy_hitters", "contamination_check", "copurchase_triangles",
        "cosine_topk", "cube_order_stats", "customer_order_seq",
        "customers_with_orders", "delta_abs_p95", "doc_fingerprints",
        "doc_splits", "duplicate_spans", "embedding_label_stats",
        "embedding_near_dup", "events_in_windows", "ewma_hourly",
        "exact_dedup", "fertility_by_lang", "gopher_quality_flags",
        "hourly_gapfill", "incremental_quantile_refresh",
        "incremental_rollup_refresh", "ivf_cosine_topk",
        "jaccard_top_pairs", "kn_trigram_surprisal", "lang_id",
        "mad_outliers", "multimodal_features", "nation_activity_full_join",
        "orders_above_customer_avg", "part_type_setops", "pii_scan",
        "qty_price_correlation",
    ]
    assert window[13:50] == r8_cohort
