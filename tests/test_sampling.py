"""Deterministic sampling/splits: stability under rerun and corpus growth —
the properties rand()-based sampling cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_iq_spark.operators import sampling as SA
from network_iq_spark.operators import text as T
from network_iq_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_hash_split_total_and_stable_under_growth(spark):
    docs = load_table(spark, SF, "documents")
    split = SA.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    assert split.filter(F.col("split").isNull()).count() == 0
    assert split.count() == n
    # growing the corpus must not move any existing row's split
    subset = SA.hash_split(
        docs.filter(F.col("doc_id") < 20), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    full = {r.doc_id: r.split for r in split.collect()}
    for r in subset.collect():
        assert full[r.doc_id] == r.split


def test_hash_split_remainder_is_null(spark):
    docs = load_table(spark, SF, "documents")
    part = SA.hash_split(docs, "doc_id", {"train": 0.5})
    assert part.filter(F.col("split").isNull()).count() > 0


def test_deterministic_sample_identical_across_runs_and_salts_differ(spark):
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert a == b and 0 < len(a) < docs.count()
    c = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.3, salt="other").collect()}
    assert c != a
    # rate monotonicity: a lower-rate sample is a subset of a higher-rate one
    d = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert d <= a


def test_stratified_sample_respects_zero_rate(spark):
    emb = load_table(spark, SF, "embeddings")
    kept = SA.stratified_sample(emb, "vec_id", "label", {0: 1.0, 1: 0.0})
    labels = {r.label for r in kept.select("label").distinct().collect()}
    assert labels == {0}
    n0 = emb.filter(F.col("label") == 0).count()
    assert kept.count() == n0  # rate 1.0 keeps every row of the stratum


def test_rate_to_basis_points_rounds_not_truncates():
    """0.57 * 10000 = 5699.999…: int() would skew the threshold a basis
    point low and diverge from any oracle computing exact basis points."""
    assert SA._bp(0.57) == 5700
    assert SA._bp(0.8) == 8000
    assert SA._bp(0.0001) == 1


def test_hash_split_cumulative_boundaries_are_exact(spark):
    """Splits whose per-term products carry float error must still land on
    the exact cumulative basis-point boundaries (0.57 → 5700, +0.1 → 6700)."""
    docs = load_table(spark, SF, "documents")
    split = SA.hash_split(docs, "doc_id", {"a": 0.57, "b": 0.1})
    bucketed = docs.select(
        "doc_id", SA.hash_bucket(F.col("doc_id")).alias("bucket")
    )
    want = {
        r.doc_id: ("a" if r.bucket < 5700 else "b" if r.bucket < 6700 else None)
        for r in bucketed.collect()
    }
    got = {r.doc_id: r.split for r in split.collect()}
    assert got == want


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    fp = {r.doc_id: r.rolling_fp for r in T.rolling_fingerprint(df).collect()}
    assert fp[1] == fp[3]          # identical text → identical fingerprint
    assert fp[1] != fp[2]          # same tokens, different order → different
    assert all(0 <= v < T.ROLL_P for v in fp.values())


def test_equalize_groups_extreme_skew_keeps_every_group(spark):
    """ADVICE r4: a group > BUCKETS (10^4)x larger than the smallest used
    to floor to rate 0 bp and vanish. The 1-bp clamp must keep it
    (over-represented, ~n/10^4 rows) rather than drop it."""
    big_n = SA.BUCKETS * 2 + 1  # 20,001 rows vs 1 — rate floors to 0 pre-clamp
    df = spark.range(big_n).select(
        F.col("id").alias("k"), F.lit("huge").alias("g")
    ).unionAll(
        spark.range(1).select((F.col("id") + big_n).alias("k"), F.lit("tiny").alias("g"))
    )
    kept = SA.equalize_groups(df, key="k", group="g")
    by_g = {r["g"]: r["n"] for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert by_g.get("huge", 0) > 0          # no longer dropped
    assert by_g["tiny"] == 1                # smallest group intact
    # clamp regime: keeps about n/BUCKETS rows (1 bp), loose 4x bound
    assert by_g["huge"] <= 4 * (big_n // SA.BUCKETS + 1)


def test_sample_k_per_group_exact_k_and_group_isolation(spark):
    """Exactly min(k, |group|) per group; and growing one group never
    changes another group's sample (the property reservoir sampling loses
    and hash ranking keeps)."""
    from network_iq_spark.operators.sampling import sample_k_per_group

    rows = [(i, "a") for i in range(20)] + [(100 + i, "b") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sample_k_per_group(df, "lang", "doc_id", 5).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_g["a"]) == 5
    assert by_g["b"] == {100, 101}  # short group kept whole

    # add rows to group b only: group a's sample must be identical
    rows2 = rows + [(200 + i, "b") for i in range(30)]
    df2 = spark.createDataFrame(rows2, "doc_id bigint, lang string")
    out2 = sample_k_per_group(df2, "lang", "doc_id", 5).collect()
    a2 = {r["doc_id"] for r in out2 if r["lang"] == "a"}
    assert a2 == by_g["a"]


def test_target_mixture_hits_shares_and_drops_untargeted(spark):
    """target_mixture: realized group shares track the integer targets to
    bucket granularity; groups absent from the targets are dropped; the
    binding (scarcest-relative-to-share) group keeps everything."""
    from pyspark.sql import functions as F

    rows = (
        [(i, "big") for i in range(8000)]
        + [(i + 10000, "mid") for i in range(3000)]
        + [(i + 20000, "rare") for i in range(400)]
        + [(i + 30000, "junk") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "k bigint, g string")
    # rare is binding: T = 400*10^4 div 2000 = 2000 → big keeps 1200 of
    # 8000 (15%), mid keeps 400 of 3000 (~13.3%), rare keeps all 400
    kept = SA.target_mixture(
        df, key="k", group="g", targets_bp={"big": 6000, "mid": 2000, "rare": 2000}
    )
    counts = {r.g: r.n for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    assert counts["rare"] == 400  # binding group: rate clamps to 100%
    # hash granularity makes realized counts approximate; ±15% is far
    # tighter than any wrong-math outcome
    assert abs(counts["big"] - 1200) / 1200 < 0.15, counts
    assert abs(counts["mid"] - 400) / 400 < 0.15, counts


def test_target_mixture_deterministic_and_stable_under_growth(spark):
    """Membership never changes when the corpus grows (only rates do) —
    re-running on the same data draws the same rows."""
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(3000)], "k bigint, g string"
    )
    t = {"a": 5000, "b": 5000}
    ids1 = {r.k for r in SA.target_mixture(df, "k", "g", t).select("k").collect()}
    ids2 = {r.k for r in SA.target_mixture(df, "k", "g", t).select("k").collect()}
    assert ids1 == ids2 and ids1


def test_weighted_sample_k_determinism_and_weight_dominance(spark):
    """E-S reservoir laws: (a) a weight-dominant item always wins its
    group (key ln(u)/w → 0⁻ as w grows, beating every unit-weight key);
    (b) the selected set is identical under repartitioning (md5 draw +
    integer key); (c) k bounds group output."""
    from pyspark.sql import functions as F

    from network_iq_spark.operators.sampling import weighted_sample_k

    rows = []
    for g in range(5):
        for i in range(40):
            did = g * 100 + i
            rows.append((did, f"g{g}", 1_000_000_000 if i == 7 else 1 + (i % 9)))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")

    out = weighted_sample_k(df, "source", "n_chars", k=3).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.source, []).append(r)
    for g, rs in by_g.items():
        assert len(rs) == 3
        assert rs[0].rank == 1 and rs[0].n_chars == 1_000_000_000  # dominant wins
    assert len(by_g) == 5

    again = weighted_sample_k(df.repartition(13), "source", "n_chars", k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
