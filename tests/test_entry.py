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
    # this round's fixes and additions must sit inside the first-50 window
    # (dataset_card — plan rewrite with UNCHANGED hash, externally
    # r7-green — yields its slot to the new progressive-JPEG query and
    # heads the overflow instead)
    window = list(qs)[:50]
    for must in ("bpe_token_stats", "decoded_jpeg420_stats",
                 "decoded_jpeg_prog_stats", "media_contract",
                 "warc_extract_stats", "decoded_gif_stats",
                 "kn_trigram_surprisal", "incremental_rollup_refresh",
                 "c4_line_filter", "gopher_quality_flags", "bm25_topk",
                 "incremental_quantile_refresh", "fertility_by_lang",
                 "related_docs_rrf", "copurchase_triangles",
                 "cm_heavy_hitters", "scd2_user_type_history",
                 "weighted_sample_per_source"):
        assert must in window, must
    assert list(qs)[50:67] == [
        "repetition_stats", "rolling_fingerprints", "rollup_order_counts",
        "scope_filtered_profile", "simhash_pairs",
        "simhash_pairs_blocked", "supplier_pagerank",
        "time_weighted_avg", "token_stats", "union_label_dims",
        "value_autocorr_lag1", "value_equidepth_histogram",
        "value_histogram", "winsorized_profile",
        "mixture_sample_counts", "hard_negatives_topk", "dataset_card",
    ]
