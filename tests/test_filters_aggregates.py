"""Direct coverage for the filter/aggregate helpers not exercised through a
registry query: threshold filter (P11), row lookup (P13), null report (A11),
conditional counts (A12), cleansing rules (P1), boolean rates (A3)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_threshold_filter_fillna_semantics(spark):
    """P11: ``fillna(0) >= t`` — nulls count as 0, not unknown."""
    from network_iq_spark.operators.filters import threshold_filter

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.1), (3, None), (4, 0.5)], "id long, pred_prob double"
    )
    got = sorted(r.id for r in threshold_filter(df, "pred_prob", 0.5).collect())
    assert got == [1, 4]
    # threshold 0 keeps the null row (fillna(0) >= 0)
    got = sorted(r.id for r in threshold_filter(df, "pred_prob", 0.0).collect())
    assert got == [1, 2, 3, 4]


def test_row_lookup_string_normalized(spark):
    """P13: lookup normalizes both sides to string (streamlit_app.py:1124)."""
    from network_iq_spark.operators.filters import row_lookup

    df = spark.createDataFrame([(1, "a"), (2, "b")], "key long, v string")
    rows = row_lookup(df, "key", 2).collect()  # int column, str-normalized probe
    assert len(rows) == 1 and rows[0].v == "b"
    assert row_lookup(df, "key", "999").collect() == []


def test_null_report_single_pass(spark):
    from network_iq_spark.operators.aggregates import null_report

    df = spark.createDataFrame(
        [(1, None, "x"), (None, 2.0, None), (3, 3.0, "z")],
        "a long, b double, c string",
    )
    row = null_report(df, ["a", "b", "c"]).collect()[0]
    assert row.row_count == 3
    assert (row.nulls_a, row.nulls_b, row.nulls_c) == (1, 1, 1)


def test_conditional_count_and_boolean_rate(spark):
    from network_iq_spark.operators.aggregates import boolean_rate, conditional_count

    df = spark.createDataFrame(
        [(45.0, 40.0), (123.0, None), (-100.0, 35.0), (200.0, 50.0)],
        "lat double, snr double",
    )
    row = conditional_count(
        df,
        {
            "bad_geo": (F.col("lat") < -90) | (F.col("lat") > 90),
            "null_snr": F.col("snr").isNull(),
        },
    ).collect()[0]
    assert row.bad_geo == 3 and row.null_snr == 1

    rates = boolean_rate(
        df, {"south": F.coalesce(F.col("lat") < 0, F.lit(False))}
    ).collect()[0]
    assert rates.south == 0.25


def test_cleansing_filter_rules(spark):
    from network_iq_spark.ingest import default_clean_rules
    from network_iq_spark.operators.filters import cleansing_filter

    df = spark.createDataFrame(
        [(10.0, 5.0), (-1.0, 5.0), (10.0, -2.0), (0.0, 0.0)],
        "latency_ms double, throughput_mbps double",
    )
    out = cleansing_filter(df, default_clean_rules()).collect()
    assert [(r.latency_ms, r.throughput_mbps) for r in out] == [(10.0, 5.0)]


def test_validate_and_quarantine_tags_all_failures(spark):
    """Rejects carry EVERY failed rule (sorted), not just the first; NULL
    predicate results are failures; valid branch has no tag column."""
    from pyspark.sql import functions as F

    from network_iq_spark.operators.quality import validate_and_quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "view"), (2, -5.0, "view"), (3, None, "bogus"), (4, 7.0, None)],
        "id bigint, v double, t string",
    )
    rules = [
        ("v_nonneg", F.col("v").isNotNull() & (F.col("v") >= 0)),
        ("t_known", F.col("t").isin("view", "click")),
    ]
    valid, rejects = validate_and_quarantine(df, rules)
    assert [r["id"] for r in valid.collect()] == [1]
    assert "failed_rules" not in valid.columns
    got = {r["id"]: list(r["failed_rules"]) for r in rejects.collect()}
    assert got == {
        2: ["v_nonneg"],
        3: ["t_known", "v_nonneg"],  # both rules, sorted
        4: ["t_known"],              # NULL predicate counts as failure
    }
