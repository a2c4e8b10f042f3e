"""Document-grain dedup queries (SURVEY.md §7 F): fingerprints, exact
dedup, n-gram Jaccard, MinHash-LSH (+ hot-bucket cap), SimHash, and
span-grain dedup/decontamination. Split out of llmdata.py in r10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from network_iq_spark.operators import dedup as D
from network_iq_spark.operators import sampling as SA
from network_iq_spark.operators import spans as SP
from network_iq_spark.operators import text as T
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table

from network_iq_spark.queries._fragments import (  # noqa: F401
    _JACCARD_CAPPED,
    _JACCARD_MAX_DF,
    _MH_BANDS,
    _MH_PROD_BANDS,
    _MH_PROD_ROWS,
    _MH_PROD_THRESHOLD,
    _MH_ROWS,
    _MH_THRESHOLD,
    _MINHASH_P,
    _SHINGLES,
    _TOKS,
    _simhash_sql,
    _sql_hex_int,
)

# ---------------------------------------------------------------------------
# Fingerprints & exact dedup
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '[ \t\n\r\f\x0b]+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (md5 over normalized text) — the exact-dedup
    key; cf. the reference's sha-256 context hash (streamlit_app.py:1162)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.fingerprint(docs).orderBy("doc_id")


@register(
    "exact_dedup",
    oracle=r"""
    SELECT md5(regexp_replace(trim(lower(text)), '[ \t\n\r\f\x0b]+', ' ', 'g')) AS fingerprint,
           MIN(doc_id) AS keeper,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1 ORDER BY fingerprint
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the fingerprint, keep min doc_id.
    One shuffle on the hash — the first stage of any dedup cascade."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(T.fingerprint(docs)).orderBy("fingerprint")


@register(
    "jaccard_top_pairs",
    oracle=f"""
    WITH {_JACCARD_CAPPED}
    SELECT doc_a, doc_b, jaccard FROM jac
    ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 100
    """,
)
def q_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup: top-100 most-similar pairs.

    Candidate pairs from frequency-capped (df ≤ 4) shingles — no unbounded
    co-shingle self-join; exact Jaccard verified over full shingle sets of
    candidates only. Integer counts make the similarity deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs)
    pairs = D.jaccard_pairs_capped(sh, threshold=0.0, max_df=_JACCARD_MAX_DF)
    return pairs.orderBy(
        F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(100)


def _minhash_sql(
    n_bands: int,
    rows_per_band: int,
    threshold: float,
    max_bucket_size: int | None = None,
    shingles_sql: str | None = None,
) -> str:
    """DuckDB replay of the full MinHash-LSH pipeline. ``shingles_sql``
    overrides the corpus (default: word 3-grams over documents) — the
    same seam _incremental_minhash_sql has, used by the chunk grain and
    (r11) the shifted-audio tier's value-shingle corpus."""
    n_hashes = n_bands * rows_per_band
    mins = ",\n      ".join(
        f"MIN(({2 * i + 1} * h + {7 * i + 3}) % {_MINHASH_P}) AS m{i}"
        for i in range(n_hashes)
    )
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"CAST(m{b * rows_per_band + j} AS VARCHAR)"
            for j in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig"
        )
    bands_sql = "\n      UNION ALL\n      ".join(band_selects)
    if max_bucket_size is not None:
        # capped candidate generation replays the operator's attribution
        # rule: a pair survives iff its globally-FIRST matching band
        # (min band over all bucket collisions) is a bucket at or under
        # the cap — identical to the Spark plan's pre-join bucket filter
        # composed with the first-matching-band dedup filter
        cand_sql = f"""sizes AS (
      SELECT band, bucket, COUNT(*) AS n FROM bb GROUP BY 1, 2
    ),
    allmatch AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band, a.bucket
      FROM bb a JOIN bb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    firstband AS (
      SELECT doc_a, doc_b, MIN(band) AS fband FROM allmatch GROUP BY 1, 2
    ),
    cand AS (
      SELECT f.doc_a, f.doc_b
      FROM firstband f
      JOIN allmatch m
        ON m.doc_a = f.doc_a AND m.doc_b = f.doc_b AND m.band = f.fband
      JOIN sizes s ON s.band = m.band AND s.bucket = m.bucket
      WHERE s.n <= {max_bucket_size}
    )"""
    else:
        cand_sql = """cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bb a JOIN bb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""
    return f"""
    WITH sh AS ({shingles_sql if shingles_sql is not None else _SHINGLES}),
    hashed AS (
      SELECT doc_id, {_sql_hex_int("substr(md5(shingle), 1, 12)", 12)} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
      {mins}
      FROM hashed GROUP BY doc_id
    ),
    sets AS (
      SELECT doc_id, list(DISTINCT h) AS hs, COUNT(DISTINCT h) AS sz
      FROM hashed GROUP BY doc_id
    ),
    bb AS (
      {bands_sql}
    ),
    {cand_sql}
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
               / (sa.sz + sb.sz - len(list_intersect(sa.hs, sb.hs))) AS jaccard
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
    )
    WHERE jaccard >= {threshold}
    ORDER BY doc_a, doc_b
    """


@register("minhash_lsh_pairs", oracle=_minhash_sql(_MH_BANDS, _MH_ROWS, _MH_THRESHOLD))
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 16 min-hashes → band buckets →
    candidate pairs → exact-Jaccard verify.

    b=16/r=1 is the recall-heavy config suited to this low-similarity
    corpus; production dedup at ~0.8 similarity uses r=4/b=4 (same plan,
    different constants). Only bucket-collision pairs are ever scored — the
    all-pairs join never happens.
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, threshold=_MH_THRESHOLD, n_bands=_MH_BANDS, rows_per_band=_MH_ROWS
    ).orderBy("doc_a", "doc_b")


@register(
    "minhash_lsh_pairs_prod",
    oracle=_minhash_sql(_MH_PROD_BANDS, _MH_PROD_ROWS, _MH_PROD_THRESHOLD),
)
def q_minhash_lsh_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH at the production S-curve constants: r=4 rows/band ×
    b=4 bands, verify threshold 0.7 — P(candidate) = 1-(1-s⁴)⁴ ≈ 0.5 at
    s≈0.72, so sub-threshold pairs rarely even reach the verify join. This
    is the config the 100 TB dedup cascade runs (the b=16/r=1 twin above is
    the recall-heavy low-similarity test setting)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs,
        threshold=_MH_PROD_THRESHOLD,
        n_bands=_MH_PROD_BANDS,
        rows_per_band=_MH_PROD_ROWS,
    ).orderBy("doc_a", "doc_b")


_MH_MAX_BUCKET = 4


@register(
    "minhash_lsh_pairs_capped",
    oracle=_minhash_sql(
        _MH_BANDS, _MH_ROWS, _MH_THRESHOLD, max_bucket_size=_MH_MAX_BUCKET
    ),
)
def q_minhash_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the hot-band guard on (r9): buckets larger than
    ``_MH_MAX_BUCKET`` members are dropped from candidate generation
    BEFORE the self-join — the cap that keeps a degenerate boilerplate
    bucket from costing |B|² pairs at corpus scale (operators/dedup.py
    minhash_lsh_pairs max_bucket_size). At this SF the cap prunes the
    largest buckets of the recall-heavy b=16/r=1 config, so the result
    observably differs from the uncapped flagship — the oracle replays
    the exact attribution rule (pair survives iff its globally-first
    matching band is an under-cap bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs,
        threshold=_MH_THRESHOLD,
        n_bands=_MH_BANDS,
        rows_per_band=_MH_ROWS,
        max_bucket_size=_MH_MAX_BUCKET,
    ).orderBy("doc_a", "doc_b")


# the shared-vocab synthetic corpus clusters tightly in SimHash space —
# distance 2 keeps the pair set a meaningful near-dup candidate list
_SIMHASH_MAX_HAMMING = 2


@register("simhash_pairs", oracle=_simhash_sql(_SIMHASH_MAX_HAMMING))
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit token-vote fingerprints, pairs within
    Hamming distance ≤ 2. Registered plan = the pigeonhole-blocked
    equi-join (recall 1.0 — a pair within distance d shares ≥1 of d+1
    exact segments), so the driver-facing catalog carries no all-pairs
    crossJoin; the brute-force formulation remains in tests
    (test_dedup_scale.py) as the semantic reference, and the SQL oracle
    here is still the brute-force pair scan."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_pairs_blocked(docs, max_hamming=_SIMHASH_MAX_HAMMING)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("doc_a", "doc_b")


@register("simhash_pairs_blocked", oracle=_simhash_sql(_SIMHASH_MAX_HAMMING))
def q_simhash_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup via pigeonhole segment blocking — the 100 TB path,
    same output (and same oracle) as the brute-force ``simhash_pairs``:
    d+1 fingerprint segments, equi-join on (segment, value), Hamming verify
    on collisions only. No cross join anywhere in the plan (asserted in
    tests/test_plan_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_pairs_blocked(docs, max_hamming=_SIMHASH_MAX_HAMMING)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Span-grain dedup & decontamination (operators/spans.py)
# ---------------------------------------------------------------------------

_WIN_K = SP.WINDOW_K

_WINS = f"""
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{_WIN_K - 1}], ' ')) AS wh
  FROM ({_TOKS}) tt,
       LATERAL unnest(generate_series(1, len(t) - {_WIN_K} + 1)) AS g(i)
  WHERE len(t) >= {_WIN_K}
"""


@register(
    "duplicate_spans",
    oracle=f"""
    WITH wins AS ({_WINS}),
    perdoc AS (SELECT DISTINCT doc_id, wh FROM wins),
    crossdoc AS (SELECT wh FROM perdoc GROUP BY wh HAVING COUNT(*) >= 2),
    dupc AS (
      SELECT w.doc_id, COUNT(*) AS n_dup FROM wins w
      JOIN crossdoc c ON w.wh = c.wh GROUP BY 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM wins GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(tot.n_windows, 0) AS n_windows,
           COALESCE(dupc.n_dup, 0) AS n_dup_windows,
           CASE WHEN COALESCE(tot.n_windows, 0) = 0 THEN 0.0
                ELSE CAST(COALESCE(dupc.n_dup, 0) AS DOUBLE) / tot.n_windows
           END AS dup_window_ratio
    FROM documents d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN dupc ON d.doc_id = dupc.doc_id
    ORDER BY d.doc_id
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-granularity exact-substring dedup signal (Lee et al. ACL'22):
    per document, how many of its 8-token windows also occur in another
    document. Windows → md5 → one shuffle on the window hash; positions
    ride along so coverage is measurable."""
    docs = load_table(spark, sf_dir, "documents")
    return SP.duplicate_window_stats(docs, k=_WIN_K).orderBy("doc_id")


_BENCH_BP = 500  # 5% of the id-hash space forms the held-out benchmark
_BENCH_HEX = _sql_hex_int("md5(CAST(doc_id AS VARCHAR) || 'bench')", 12)


@register(
    "contamination_check",
    oracle=f"""
    WITH tagged AS (
      SELECT *, ({_BENCH_HEX}) % 10000 < {_BENCH_BP} AS is_bench FROM documents
    ),
    twins AS (
      SELECT DISTINCT doc_id AS train_doc, wh FROM ({_WINS.replace("documents", "(SELECT * FROM tagged WHERE NOT is_bench)")})
    ),
    bwins AS (
      SELECT DISTINCT doc_id AS bench_doc, wh FROM ({_WINS.replace("documents", "(SELECT * FROM tagged WHERE is_bench)")})
    )
    SELECT train_doc,
           COUNT(DISTINCT t.wh) AS n_shared_windows,
           COUNT(DISTINCT bench_doc) AS n_bench_docs
    FROM twins t JOIN bwins b ON t.wh = b.wh
    GROUP BY train_doc ORDER BY train_doc
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram benchmark decontamination (GPT-3/PaLM appendix style): a
    deterministic 5% id-hash slice plays the held-out benchmark; training
    docs sharing any 8-token window with it are flagged with shared-window
    and benchmark-doc counts. One equi-join on the window hash — the
    benchmark side broadcasts at real scale."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = SA.hash_bucket(F.col("doc_id"), "bench") < _BENCH_BP
    return SP.contamination_overlap(
        docs.filter(~is_bench), docs.filter(is_bench), k=_WIN_K
    ).orderBy("train_doc")


@register(
    "decontamination_spans",
    oracle=f"""
    WITH tagged AS (
      SELECT *, ({_BENCH_HEX}) % 10000 < {_BENCH_BP} AS is_bench FROM documents
    ),
    twins AS (
      SELECT doc_id AS train_doc, pos, wh
      FROM ({_WINS.replace("documents", "(SELECT * FROM tagged WHERE NOT is_bench)")})
    ),
    bw AS (
      SELECT DISTINCT wh
      FROM ({_WINS.replace("documents", "(SELECT * FROM tagged WHERE is_bench)")})
    ),
    hits AS (
      SELECT train_doc, pos AS s, pos + {_WIN_K} AS e
      FROM twins JOIN bw USING (wh)
    ),
    marked AS (
      SELECT *,
             MAX(e) OVER (PARTITION BY train_doc ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM hits
    ),
    islands AS (
      SELECT *,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY train_doc ORDER BY s
                 ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    )
    SELECT train_doc, CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(MAX(e) - MIN(s) AS BIGINT) AS span_tokens
    FROM islands GROUP BY train_doc, island
    ORDER BY train_doc, span_start
    """,
)
def q_decontamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-grain benchmark decontamination (r9) — the EXCISION list one
    step past contamination_check's doc-grain flags: the maximal merged
    token intervals of each training doc covered by any 8-token window
    shared with the (5% id-hash slice) benchmark — what a pipeline cuts
    instead of discarding whole documents (operators/spans.py
    decontamination_spans; gaps-and-islands merge, all-integer interval
    arithmetic, per-doc window partitions bounded by doc length)."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = SA.hash_bucket(F.col("doc_id"), "bench") < _BENCH_BP
    out = SP.decontamination_spans(
        docs.filter(~is_bench), docs.filter(is_bench), k=_WIN_K
    )
    return out.select(
        "train_doc",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
    ).orderBy("train_doc", "span_start")


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS ({_TOKS}),
    head AS (
      SELECT doc_id, len(t) AS n_tokens,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
             END AS distinct_token_ratio
      FROM t
    ),
    bi AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM t, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
      WHERE len(t) >= 2
    ),
    c AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2),
    top AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_share
      FROM c GROUP BY 1
    )
    SELECT h.doc_id, h.n_tokens, h.distinct_token_ratio,
           COALESCE(top.top_bigram_share, 0.0) AS top_bigram_share
    FROM head h LEFT JOIN top ON h.doc_id = top.doc_id
    ORDER BY h.doc_id
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: distinct-token ratio (map-only
    array expression) + top-bigram share (explode → two map-side-combinable
    aggregates — linear in doc length, unlike an array-only argmax)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_stats(docs).orderBy("doc_id")


@register(
    "pii_scan",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text),
             '{T.PII_PATTERNS["email"]}'))) AS BIGINT) AS n_email,
           CAST(SUM(len(regexp_extract_all(lower(text),
             '{T.PII_PATTERNS["phone"]}'))) AS BIGINT) AS n_phone,
           CAST(SUM(len(regexp_extract_all(lower(text),
             '{T.PII_PATTERNS["ipv4"]}'))) AS BIGINT) AS n_ipv4
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit per source: match counts for the scrub patterns
    (operators/text.py redact_pii — email/phone/IPv4). Map + one groupBy on
    source; the redaction itself is unit-tested on synthetic rows (this
    corpus is PII-free, and the oracle agrees it is — both engines run the
    same conservative dialect-portable regexes)."""
    docs = load_table(spark, sf_dir, "documents")
    red = T.redact_pii(docs, out_col="__red__")
    return (
        red.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("pii_email_count").alias("n_email"),
            F.sum("pii_phone_count").alias("n_phone"),
            F.sum("pii_ipv4_count").alias("n_ipv4"),
        )
        .orderBy("source")
    )
