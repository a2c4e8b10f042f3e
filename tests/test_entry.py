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
    # the r10 window FINISHES the rotation: the 31 r6-stamped overflow
    # queries lead (exactly as the r9 verdict ordered them), then the
    # r10 additions + code-touched queries, then oldest-r7 fills —
    # after it samples green no sheet stamp predates r7
    window = list(qs)[:50]
    assert window[:5] == ["ann_int_multiprobe_topk", "bucketed_order_lineitem",
                          "calendar_features", "cast_coercion",
                          "chunk_manifest"]
    for must in (
        # tail of the 31-query r6 overflow
        "span_corruption_manifest", "time_sliced_rolling",
        "training_data_pipeline_overlap", "variant_props_stats",
        "weighted_discount",
        # r10 additions
        "chunk_near_dup_pairs_capped", "media_dhash_index",
        "incremental_image_dedup_probe", "chunk_bm25_topk",
        "incremental_chunk_near_dup", "chunk_overlap_admission",
        "packing_efficiency",
        "image_near_dup_pairs_capped",
        # expressions / shared-core changed in r10
        "chunk_near_dup_pairs", "incremental_image_dedup",
        "image_near_dup_pairs", "audio_near_dup_pairs",
        "video_near_dup_pairs", "media_near_dup_census",
        "image_dedup_clusters",
    ):
        assert must in window, must
    # all 31 r6-stamped names occupy the first 31 slots
    assert window.index("weighted_discount") == 30
