"""Span-grain dedup/decontamination operators + PII scrub + repetition."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_iq_spark.operators import spans as SP
from network_iq_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_positional_windows_positions_and_short_doc_drop(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b")])
    w = SP.positional_windows(df, k=3).collect()
    assert {r.doc_id for r in w} == {1}  # doc 2 has < k tokens
    assert sorted(r.pos for r in w) == [1, 2, 3]  # 5 tokens, k=3 → 3 windows


def test_duplicate_window_stats_cross_doc_only(spark):
    # docs 1 and 2 share the window "x y z"; doc 3 repeats its own window
    # twice but shares nothing cross-doc; doc 4 is too short for windows
    df = _docs(
        spark,
        [
            (1, "x y z p q"),
            (2, "r s x y z"),
            (3, "m n o m n o m n o"),
            (4, "hi"),
        ],
    )
    got = {r.doc_id: r for r in SP.duplicate_window_stats(df, k=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].n_windows, got[1].n_dup_windows) == (3, 1)
    assert (got[2].n_windows, got[2].n_dup_windows) == (3, 1)
    # intra-doc repetition is NOT cross-doc duplication
    assert got[3].n_dup_windows == 0 and got[3].n_windows == 7
    assert (got[4].n_windows, got[4].n_dup_windows, got[4].dup_window_ratio) == (
        0, 0, 0.0,
    )
    assert got[1].dup_window_ratio == 1 / 3


def test_duplicate_window_stats_counts_every_position(spark):
    # doc 1 contains the shared window TWICE: both positions count toward
    # n_dup_windows (span coverage, not set membership)
    df = _docs(spark, [(1, "x y z x y z"), (2, "x y z")])
    got = {r.doc_id: r for r in SP.duplicate_window_stats(df, k=3).collect()}
    assert got[1].n_dup_windows == 2  # positions 1 and 4
    assert got[2].n_dup_windows == 1


def test_contamination_overlap_counts_distinct(spark):
    train = _docs(spark, [(1, "a b c d e"), (2, "z z z z")])
    bench = _docs(
        spark, [(10, "a b c q r"), (11, "p a b c s"), (12, "no match here kk")]
    )
    got = {r.train_doc: r for r in SP.contamination_overlap(train, bench, k=3).collect()}
    assert set(got) == {1}  # doc 2 shares nothing
    # window "a b c" hits two bench docs but is ONE shared window
    assert got[1].n_shared_windows == 1
    assert got[1].n_bench_docs == 2


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact Bob.Smith+x@Example.COM or 555-123-4567 now"),
            (2, "server at 10.0.0.1 and 192.168.1.254 ok"),
            (3, "nothing sensitive here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in T.redact_pii(df).collect()}
    assert got[1].text == "contact <EMAIL> or <PHONE> now"
    assert (got[1].pii_email_count, got[1].pii_phone_count) == (1, 1)
    assert got[2].text == "server at <IPV4> and <IPV4> ok"
    assert got[2].pii_ipv4_count == 2
    assert got[3].text == "nothing sensitive here"
    assert (
        got[3].pii_email_count,
        got[3].pii_phone_count,
        got[3].pii_ipv4_count,
    ) == (0, 0, 0)


def test_repetition_stats_flags_degenerate_text(spark):
    df = _docs(
        spark,
        [
            (1, "spam ham " * 20),          # loops: one bigram dominates
            (2, "a b c d e f g h i j"),     # fully diverse
            (3, "solo"),                    # 1 token → no bigrams
            (4, ""),                        # empty
        ],
    )
    got = {r.doc_id: r for r in T.repetition_stats(df).collect()}
    assert got[1].distinct_token_ratio == 2 / 40
    assert got[1].top_bigram_share > 0.5
    assert got[2].distinct_token_ratio == 1.0
    assert got[2].top_bigram_share == 1 / 9  # every bigram unique
    assert got[3].top_bigram_share == 0.0
    assert (got[4].n_tokens, got[4].distinct_token_ratio) == (0, 0.0)


def test_spans_plan_has_no_cartesian_and_window_build_is_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wplan = (
        SP.positional_windows(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # window build: pure map + explode. The only permissible exchange is the
    # under-split input guard (round-robin ensure_parallelism, which no-ops
    # at real scale) — never a data-keyed shuffle.
    assert "hashpartitioning" not in wplan
    assert "rangepartitioning" not in wplan
    for op in (
        SP.duplicate_window_stats(docs),
        SP.contamination_overlap(
            docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
        ),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_decontamination_spans_merges_overlapping_windows(spark):
    """Planted contamination: a train doc embeds two benchmark fragments —
    one long (many overlapping shared windows -> ONE merged island) and
    one disjoint (its own island); clean docs emit nothing. Intervals are
    1-based [start, end) token positions, verified by hand."""
    from network_iq_spark.operators.spans import decontamination_spans

    bench_frag = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench2 = "one two three four five six seven eight"
    filler = "red green blue cyan magenta yellow black white purple orange"
    train_text = f"{filler} {bench_frag} {filler} {bench2}"
    train = spark.createDataFrame(
        [(1, train_text), (2, f"{filler} {filler} {filler}")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_frag), (101, bench2)], "doc_id long, text string"
    )
    got = sorted(
        (r.train_doc, r.span_start, r.span_end, r.span_tokens)
        for r in decontamination_spans(train, bench, k=8).collect()
    )
    # doc 1 tokens: 10 filler + 10 frag + 10 filler + 8 bench2 = 38.
    # bench_frag's 8-token windows start at train positions 11, 12, 13
    # (frag has 10 tokens -> 3 windows) -> merged island [11, 21).
    # bench2 (8 tokens) = one window at position 31 -> island [31, 39).
    assert got == [(1, 11, 21, 10), (1, 31, 39, 8)]
