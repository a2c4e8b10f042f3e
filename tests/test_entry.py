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
    # the r14 window (r13 verdict item 1 + the r14 in-round review +
    # the r14 OPTIMIZATION rotation): five r9 stragglers -> seven NEW
    # r14 queries -> five guard-touched (bench-SF plan changed) ->
    # plan-identical refactor-touched -> the 14 optimization-touched
    # queries whose executed plan changed this round (CC-convergence
    # consumers, graph/pipeline rewrites, shared-tokenize retrieval,
    # map-side capped tiers, walk-prefix-sum audio tier, census) ->
    # first 9 of the oldest-r10 cohort; the displaced r10 entries keep
    # their r10 stamps and lead the r15 overflow
    window = list(qs)[:50]
    assert window[:27] == [
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
    ]
    opt_touched = [
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
    ]
    r10_head = [
        "ann_int_multiprobe_topk",
        "audio_near_dup_pairs",
        "bucketed_order_lineitem",
        "calendar_features",
        "cast_coercion",
        "chunk_bm25_topk",
        "chunk_manifest",
        "chunk_near_dup_pairs",
        "chunk_near_dup_pairs_capped",
    ]
    assert window[27:50] == opt_touched + r10_head
