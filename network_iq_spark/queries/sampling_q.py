"""Deterministic sampling & split queries: rolling fingerprints,
leakage-safe doc/group splits, stratified/mixture/temperature sampling.
Split out of llmdata.py in r10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from network_iq_spark.operators import sampling as SA
from network_iq_spark.operators import text as T
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table

from network_iq_spark.queries._fragments import (  # noqa: F401
    _SPLIT_HEX,
    _SPLIT_SALT,
    _TOKS,
    _sql_hex_int,
)

# ---------------------------------------------------------------------------
# Deterministic sampling / splits & rolling fingerprint
# ---------------------------------------------------------------------------

_ROLL_FP_HEX = _sql_hex_int("substr(md5(x), 1, 12)", 12)


@register(
    "rolling_fingerprints",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST({_ROLL_FP_HEX} AS BIGINT) FOR x IN t]),
             (acc, x) -> (acc * {T.ROLL_B} + x) % {T.ROLL_P}) AS rolling_fp
    FROM ({_TOKS}) ORDER BY doc_id
    """,
)
def q_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp–Rabin rolling fingerprint per document (order-sensitive, the
    streaming-friendly sibling of the md5 content hash in doc_fingerprints).
    Integer-exact fold — the oracle replays it with list_reduce."""
    docs = load_table(spark, sf_dir, "documents")
    return T.rolling_fingerprint(docs).orderBy("doc_id")


@register(
    "doc_splits",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, length(text) AS n_chars,
             CAST({_SPLIT_HEX} AS BIGINT) % 10000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM b GROUP BY 1 ORDER BY split
    """,
)
def q_doc_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed train/val/test assignment (operators/sampling.py): a doc's
    split never changes as the corpus grows — the reproducibility property
    randomSplit lacks. Map-only at any scale; the oracle replays the md5
    bucket arithmetic exactly."""
    docs = load_table(spark, sf_dir, "documents")
    split = SA.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt=_SPLIT_SALT
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.length("text")).cast("double") / F.count("*")
            ).alias("avg_chars"),
        )
        .orderBy("split")
    )


_GSPLIT_HEX = _sql_hex_int(f"md5(source || '{_SPLIT_SALT}')", 12)


@register(
    "group_safe_splits",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             CAST({_GSPLIT_HEX} AS BIGINT) % 10000 AS bucket
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, source,
             CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    ),
    leak AS (
      SELECT CAST(MAX(n) AS BIGINT) AS max_splits_per_source FROM (
        SELECT source, COUNT(DISTINCT split) AS n FROM assigned GROUP BY source
      )
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           MAX(l.max_splits_per_source) AS max_splits_per_source
    FROM assigned CROSS JOIN leak l
    GROUP BY split ORDER BY split
    """,
)
def q_group_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test assignment: the split hash keys on the
    SOURCE (site/domain), not the document — near-duplicates from the
    same origin land in the same split, so eval never scores lightly-
    edited copies of training documents (the leakage mode per-doc
    hashing, `doc_splits`, cannot prevent). The result carries its own
    audit column: max_splits_per_source == 1 IS the no-leakage proof,
    computed in-plan rather than asserted offline. Map-only assignment +
    two small aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    split = SA.hash_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, salt=_SPLIT_SALT
    )
    leak = (
        split.select("source", "split")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").cast("bigint").alias("max_splits_per_source"))
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_sources", "max_splits_per_source")
        .orderBy("split")
    )


_STRAT_RATES = {0: 0.5, 1: 0.25, 2: 0.1}
_STRAT_HEX = _sql_hex_int("md5(CAST(vec_id AS VARCHAR))", 12)


@register(
    "stratified_sample_counts",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label,
             CAST({_STRAT_HEX} AS BIGINT) % 10000 AS bucket
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n
    FROM b
    WHERE bucket < CASE label WHEN 0 THEN 5000 WHEN 1 THEN 2500
                              WHEN 2 THEN 1000 ELSE 0 END
    GROUP BY label ORDER BY label
    """,
)
def q_stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible sampleBy):
    label 0 keeps 50%, label 1 keeps 25%, label 2 keeps 10%, the rest drop.
    Stateless map at any scale; same rows on every rerun by construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    kept = SA.stratified_sample(emb, "vec_id", "label", _STRAT_RATES)
    return kept.groupBy("label").agg(F.count("*").alias("n")).orderBy("label")


_MIX_TARGETS = {"en": 4000, "es": 2500, "de": 2000, "fr": 1000, "zh": 500}
_MIX_HEX = _sql_hex_int("md5(CAST(doc_id AS VARCHAR) || 'mix')", 12)


def _mixture_sql() -> str:
    case = " ".join(
        f"WHEN '{g}' THEN {bp}" for g, bp in _MIX_TARGETS.items()
    )
    return f"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT lang, n, CASE lang {case} END AS share FROM c),
    f AS (SELECT MIN(n * 10000 // share) AS T FROM t
          WHERE share IS NOT NULL AND share > 0),
    r AS (SELECT lang, n,
                 GREATEST((share * (SELECT T FROM f) // 10000) * 10000 // n,
                          1) AS rate
          FROM t WHERE share IS NOT NULL AND share > 0),
    b AS (SELECT lang, CAST({_MIX_HEX} AS BIGINT) % 10000 AS bucket
          FROM documents),
    k AS (SELECT b.lang, COUNT(*) AS n_kept FROM b JOIN r ON b.lang = r.lang
          WHERE b.bucket < r.rate GROUP BY b.lang)
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_total,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM c LEFT JOIN k ON c.lang = k.lang ORDER BY c.lang
    """


@register("mixture_sample_counts", oracle=_mixture_sql())
def q_mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic downsampling to a TARGET language mixture
    (operators/sampling.py target_mixture — the general form of
    equalize_groups: Pile/DoReMi-style domain reweighting with explicit
    shares, all-integer feasibility/rate math, md5-bucket membership).
    Per-language corpus count and kept count under targets
    en 40% / es 25% / de 20% / fr 10% / zh 5% of the feasible output.
    One tiny per-group aggregate + broadcast rate table + map-only pass;
    the oracle replays the feasibility computation AND the drawn set
    exactly, so both the math and the membership hash are checked."""
    docs = load_table(spark, sf_dir, "documents")
    kept = SA.target_mixture(docs, "doc_id", "lang", _MIX_TARGETS)
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    kcount = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        totals.join(kcount, "lang", "left")
        .select(
            "lang",
            F.col("n_total").cast("bigint").alias("n_total"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
        .orderBy("lang")
    )


@register(
    "temperature_mix_weights",
    oracle="""
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
      FROM documents
    ),
    g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM t GROUP BY 1
    ),
    g2 AS (
      SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                     AS BIGINT) AS sqrt_units
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(sqrt_units) AS BIGINT) AS tot_units,
             CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
      FROM g2
    )
    SELECT lang, n_docs, n_tokens,
           (sqrt_units * 1000000) // tot_units AS weight_ppm,
           (n_tokens * 1000000) // tot_tokens AS natural_ppm
    FROM g2, tot ORDER BY lang
    """,
)
def q_temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-sampling weights (r9) — the
    exponent-smoothed sampling multilingual pipelines use (XLM-R-style
    p_i ∝ n_i^α with α = 0.5) next to the explicit-share
    ``target_mixture``: per-language token counts, the α-scaled share,
    and the natural share, both in integer ppm. Determinism: IEEE sqrt
    is correctly rounded so both engines agree bit-for-bit; each
    language's α-weight quantizes to integer micro-units BEFORE the
    cross-language sum (the dsum pattern), and the shares are integer
    floor-division — no float aggregation order anywhere. One tiny
    per-lang aggregate + a broadcast 1-row totals join."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.select("lang", F.size(T.tokens("text")).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "sqrt_units",
            F.expr(
                "cast(floor(sqrt(cast(n_tokens as double)) * 1000000.0D) as bigint)"
            ),
        )
    )
    tot = g.agg(
        F.sum("sqrt_units").alias("tot_units"),
        F.sum("n_tokens").alias("tot_tokens"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr("(sqrt_units * 1000000) div tot_units").alias("weight_ppm"),
            F.expr("(n_tokens * 1000000) div tot_tokens").alias("natural_ppm"),
        )
        .orderBy("lang")
    )
