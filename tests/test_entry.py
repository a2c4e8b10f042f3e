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
    # the r9 window drains the rotation debt: the five never-sampled
    # queries lead, the full r5-stamped cohort and dataset_card follow,
    # the four queries whose shared code changed this round re-prove
    # their hashes, and the rest is oldest-r6 fill
    window = list(qs)[:50]
    for must in ("mixture_sample_counts", "hard_negatives_topk",
                 "image_near_dup_pairs", "bm25_topk_capped",
                 "related_docs_rrf_dense", "minhash_lsh_pairs_capped",
                 "audio_near_dup_pairs", "video_near_dup_pairs",
                 "incremental_image_dedup", "media_near_dup_census",
                 "temperature_mix_weights", "image_dedup_clusters",
                 "ivf_int_recenter_stats", "decontamination_spans",
                 "chunk_near_dup_pairs", "packing_ffd",
                 # the 14-query r5 cohort
                 "repetition_stats", "rolling_fingerprints",
                 "rollup_order_counts", "scope_filtered_profile",
                 "simhash_pairs", "simhash_pairs_blocked",
                 "supplier_pagerank", "time_weighted_avg", "token_stats",
                 "union_label_dims", "value_autocorr_lag1",
                 "value_equidepth_histogram", "value_histogram",
                 "winsorized_profile",
                 "dataset_card",
                 # shared code changed this round
                 "minhash_lsh_pairs", "minhash_lsh_pairs_prod",
                 "bm25_topk", "related_docs_rrf"):
        assert must in window, must
    # after this window samples green, no sheet query's latest external
    # stamp predates r6: everything NOT in the window is r6-or-newer
    assert window[:5] == ["mixture_sample_counts", "hard_negatives_topk",
                          "image_near_dup_pairs", "bm25_topk_capped",
                          "related_docs_rrf_dense"]
