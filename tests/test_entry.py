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
    # the r11 window: the four never-sampled queries lead (crop tier +
    # its incremental probe, the two newly oracle-paired shifted tiers),
    # then the two GIF-codec-touched queries, then the ENTIRE 44-query
    # r7 cohort — after it samples green no sheet stamp predates r8
    window = list(qs)[:50]
    assert window[:6] == [
        "image_cropped_near_dup_pairs", "incremental_image_crop_probe",
        "audio_shifted_near_dup_pairs", "video_frame_shifted_pairs",
        "decoded_gif_stats", "media_contract",
    ]
    r7_cohort = [
        "ann_ivfpq_topk", "ann_pq_adc_topk", "ann_pq_rerank_topk",
        "bpe_train_merges", "brand_top_parts", "centered_mavg_volume",
        "cluster_keep_best", "cohort_retention", "customers_without_orders",
        "decoded_audio_stats", "decoded_video_stats", "dedup_clusters",
        "dedup_keep_last", "event_type_domains", "funnel_steps",
        "group_safe_splits", "hourly_baseline", "hourly_compare_unpivot",
        "hourly_profile", "hourly_type_pivot", "html_extract",
        "json_props_stats", "kpi_cards", "latest_snapshot",
        "lsh_quality_report", "minmax_norm", "nation_supplier_balance",
        "order_line_rollup", "order_priority_stats", "order_snapshot_diff",
        "pricing_summary", "quality_psi_drift", "recursive_copurchase_reach",
        "regional_revenue", "risky_hours", "rolling_features",
        "segment_acctbal_stats", "sequence_packing", "simhash60_pairs",
        "stratified_sample_counts", "top_revenue_customers",
        "training_data_pipeline", "url_canonical_dedup",
        "zscore_top_anomalies",
    ]
    assert window[6:50] == r7_cohort
