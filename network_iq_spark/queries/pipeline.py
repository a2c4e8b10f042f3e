"""Training-data assembly queries (beyond-reference LLM-data tier, round 4).

The operators a 100 TB pre-training pipeline runs *after* dedup/quality
filtering: sequence packing into fixed token budgets, corpus-relative n-gram
rarity (the deterministic perplexity-filter stand-in), semantic dedup over
embeddings (SemDeDup-style), deterministic domain-mix resampling, and PII
redaction as a checkable transform. Every query has a full DuckDB oracle —
including the approximate/clustered ones, whose deterministic seeding makes
the whole approximation replayable in SQL (same design as ivf_cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from network_iq_spark.operators import packing as PK
from network_iq_spark.operators import sampling as SA
from network_iq_spark.operators import similarity as S
from network_iq_spark.operators import text as T
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table
from network_iq_spark.queries._fragments import _TOKS, _sql_hex_int

# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 512


@register(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT source AS shard, doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM t
    )
    SELECT shard, cum_before // {_PACK_CAPACITY} AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents laid end-to-end per
    shard (``source``) in doc_id order, cut into {cap}-token packs; a doc
    belongs to the pack where it starts. Per-shard window (never global) —
    the prefix sum parallelizes across shards (operators/packing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    out = PK.sequence_packing(docs, capacity=_PACK_CAPACITY)
    return out


_FFD_CAPACITY = 128


def _ffd_cte() -> str:
    """The recursive-CTE FFD simulation through ``final`` (per-shard open-
    pack load/count lists) — shared by packing_ffd and the strategy-
    comparison query so both replay the SAME simulation."""
    return f"""base AS (
      SELECT source AS shard, doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
      FROM documents
    ),
    docs AS (
      SELECT shard, doc_id, nt,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id)
               AS step
      FROM base WHERE nt > 0
    ),
    counts AS (SELECT shard, MAX(step) AS n_steps FROM docs GROUP BY 1),
    sim(shard, step, loads, counts_l) AS (
      SELECT shard, 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]) FROM counts
      UNION ALL
      SELECT s.shard, s.step + 1,
             CASE WHEN fit.j IS NULL
                  THEN list_append(s.loads, d.nt)
                  ELSE list_transform(generate_series(1, len(s.loads)),
                         i -> CASE WHEN i = fit.j THEN s.loads[i] + d.nt
                              ELSE s.loads[i] END)
             END,
             CASE WHEN fit.j IS NULL
                  THEN list_append(s.counts_l, CAST(1 AS BIGINT))
                  ELSE list_transform(generate_series(1, len(s.counts_l)),
                         i -> CASE WHEN i = fit.j THEN s.counts_l[i] + 1
                              ELSE s.counts_l[i] END)
             END
      FROM sim s
      JOIN docs d ON d.shard = s.shard AND d.step = s.step + 1
      LEFT JOIN LATERAL (
        SELECT MIN(i) AS j
        FROM unnest(generate_series(1, len(s.loads))) AS t(i)
        WHERE s.loads[i] + d.nt <= {_FFD_CAPACITY}
      ) AS fit ON TRUE
    ),
    final AS (
      SELECT s.shard, s.loads, s.counts_l
      FROM sim s JOIN counts c ON c.shard = s.shard AND s.step = c.n_steps
    )"""


@register(
    "packing_ffd",
    oracle=f"""
    WITH RECURSIVE {_ffd_cte()}
    SELECT shard, CAST(i AS BIGINT) AS pack_id,
           counts_l[i] AS n_docs, loads[i] AS pack_tokens,
           {_FFD_CAPACITY} - loads[i] AS padding
    FROM final, unnest(generate_series(1, len(loads))) AS g(i)
    ORDER BY shard, pack_id
    """,
)
def q_packing_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing packing WITHOUT document splitting (r9) — the
    strategy for workloads where a doc must not straddle sequences
    (instruction tuning, contrastive pairs): longest-first, each doc
    whole into the first open pack with room (classic FFD ≤ 11/9·OPT+1).
    Per-shard FFD inside applyInPandas — the sequential loop is inherent
    to bin packing, so the design bounds it by shard size, the same
    parallel unit real pipelines pack within (operators/packing.py
    ffd_packing). All-integer and deterministic, so the DuckDB oracle
    replays the simulation exactly with a recursive CTE (per-shard state
    = the open-pack load list)."""
    docs = load_table(spark, sf_dir, "documents")
    return PK.ffd_packing(docs, capacity=_FFD_CAPACITY).orderBy(
        "shard", "pack_id"
    )


@register(
    "packing_efficiency",
    oracle=f"""
    WITH RECURSIVE {_ffd_cte()},
    ffd_arm AS (
      SELECT shard, 'ffd' AS strategy,
             CAST(len(loads) AS BIGINT) AS n_packs,
             CAST(list_sum(loads) AS BIGINT) AS total_tokens
      FROM final
    ),
    cc_tot AS (
      SELECT shard, CAST(SUM(nt) AS BIGINT) AS total_tokens
      FROM base WHERE nt > 0 GROUP BY shard
    ),
    cc_arm AS (
      SELECT shard, 'concat' AS strategy,
             (total_tokens + {_FFD_CAPACITY - 1}) // {_FFD_CAPACITY} AS n_packs,
             total_tokens
      FROM cc_tot
    ),
    arms AS (SELECT * FROM ffd_arm UNION ALL SELECT * FROM cc_arm)
    SELECT shard, strategy, n_packs, total_tokens,
           n_packs * {_FFD_CAPACITY} - total_tokens AS padding,
           (1000000 * total_tokens) // (n_packs * {_FFD_CAPACITY})
             AS utilization_ppm
    FROM arms ORDER BY shard, strategy
    """,
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-strategy comparison report (r10) — the number a training-
    data engineer actually decides with: per shard and strategy, pack
    count, token total, padding, and integer-ppm utilization at the SAME
    capacity ({cap} tokens). The concat-and-chunk arm needs no
    simulation at all (a contiguous stream cut at capacity fills every
    pack except the shard's last, so n_packs = ceil(total/cap) — pure
    integer arithmetic over one per-shard agg); the FFD arm aggregates
    the per-shard simulation (operators/packing.py ffd_packing), whose
    recursive-CTE oracle is shared verbatim with packing_ffd. Corpus =
    docs with ≥1 token (the FFD contract) in both arms, so the arms are
    comparable. The report quantifies the actual tradeoff: concat wastes
    ~nothing but splits documents; FFD never splits and pays measured
    padding — at 100 TB the padding percentage IS the wasted compute of
    every downstream training epoch."""
    docs = load_table(spark, sf_dir, "documents")
    cap = _FFD_CAPACITY
    ffd = (
        PK.ffd_packing(docs, capacity=cap)
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_packs"),
            F.sum("pack_tokens").cast("bigint").alias("total_tokens"),
        )
        .withColumn("strategy", F.lit("ffd"))
    )
    base = docs.select(
        F.col("source").alias("shard"), T.tokens("text").alias("_toks")
    ).filter(F.size("_toks") > 0)
    concat = (
        base.groupBy("shard")
        .agg(F.sum(F.size("_toks")).cast("bigint").alias("total_tokens"))
        .select(
            "shard",
            F.expr(f"(total_tokens + {cap - 1}) div {cap}").alias("n_packs"),
            "total_tokens",
        )
        .withColumn("strategy", F.lit("concat"))
    )
    arms = ffd.select("shard", "strategy", "n_packs", "total_tokens").unionByName(
        concat.select("shard", "strategy", "n_packs", "total_tokens")
    )
    return arms.select(
        "shard",
        "strategy",
        "n_packs",
        "total_tokens",
        F.expr(f"n_packs * {cap} - total_tokens").alias("padding"),
        F.expr(f"(1000000 * total_tokens) div (n_packs * {cap})").alias(
            "utilization_ppm"
        ),
    ).orderBy("shard", "strategy")


# ---------------------------------------------------------------------------
# Corpus-relative bigram rarity (perplexity-filter stand-in)
# ---------------------------------------------------------------------------

_RARE_MAX = 2


@register(
    "bigram_rarity",
    oracle=f"""
    WITH t AS ({_TOKS}),
    bi AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM t, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
      WHERE len(t) >= 2
    ),
    corpus AS (SELECT bigram, COUNT(*) AS freq FROM bi GROUP BY 1),
    per AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN freq <= {_RARE_MAX} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rare,
             CAST(SUM(freq) AS BIGINT) AS fsum
      FROM bi JOIN corpus USING (bigram) GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(n_rare, 0) AS BIGINT) AS n_rare,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                ELSE CAST(n_rare AS DOUBLE) / n_bigrams END AS rare_ratio,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                ELSE CAST(fsum AS DOUBLE) / n_bigrams END AS mean_bigram_freq
    FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
    """,
)
def q_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based corpus-rarity features — the bit-deterministic stand-in
    for an n-gram-LM perplexity filter (no ``ln``: every value is an
    integer count or integer ratio). operators/text.py bigram_rarity."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bigram_rarity(docs, rare_max=_RARE_MAX).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Kneser-Ney trigram surprisal (the real perplexity-filter LM)
# ---------------------------------------------------------------------------

# the discounted-probability expression, shared verbatim between the Spark
# plan (operators/text.py builds the identical infix via F.expr) and the
# oracle below — identical text → identical IEEE op tree → identical ln arg
_KN_P = """
           (greatest(cast(c3 as double) - 0.75, 0.0)
            / cast(ctx_cnt as double))
           + ((0.75 * cast(ctx_types as double) / cast(ctx_cnt as double))
              * ((greatest(cast(cont_w1 as double) - 0.75, 0.0)
                  / cast(mid_total as double))
                 + ((0.75 * cast(mid_types as double)
                     / cast(mid_total as double))
                    * (cast(cont_prec as double)
                       / cast(total_bigram_types as double)))))
"""


@register(
    "kn_trigram_surprisal",
    oracle=f"""
    WITH t AS ({_TOKS}),
    tri AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
      FROM t, LATERAL unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ),
    t3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
    ctx AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS ctx_cnt,
                   COUNT(*) AS ctx_types
            FROM t3 GROUP BY 1, 2),
    l2 AS (SELECT w2, w3, COUNT(*) AS cont_w1 FROM t3 GROUP BY 1, 2),
    mid AS (SELECT w2, CAST(SUM(cont_w1) AS BIGINT) AS mid_total,
                   COUNT(*) AS mid_types
            FROM l2 GROUP BY 1),
    r AS (SELECT w3, COUNT(*) AS cont_prec FROM l2 GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total_bigram_types FROM l2),
    scored AS (
      SELECT w1, w2, w3,
             CAST(FLOOR(-ln({_KN_P}) * 1000.0) AS BIGINT) AS mnats
      FROM t3 JOIN ctx USING (w1, w2) JOIN l2 USING (w2, w3)
           JOIN mid USING (w2) JOIN r USING (w3) CROSS JOIN tot
    )
    SELECT tri.doc_id, COUNT(*) AS n_trigrams,
           CAST(SUM(mnats) AS BIGINT) AS kn_surprisal_mnats,
           CAST(SUM(mnats) AS DOUBLE) / COUNT(*) AS avg_kn_surprisal_mnats
    FROM tri JOIN scored USING (w1, w2, w3)
    GROUP BY tri.doc_id ORDER BY tri.doc_id
    """,
)
def q_kn_trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram surprisal per document — the actual
    CCNet/KenLM perplexity-filter mechanism (continuation counts, absolute
    discount 0.75), bit-replayable via integer milli-nat quantization.
    operators/text.py kn_trigram_surprisal."""
    docs = load_table(spark, sf_dir, "documents")
    return T.kn_trigram_surprisal(docs)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: cluster, then near-dup within cluster)
# ---------------------------------------------------------------------------

_SD_CELLS, _SD_THRESHOLD = 16, 0.30


def _semantic_dedup_sql(n_cells: int, threshold: float) -> str:
    cent_h = _sql_hex_int("md5(CAST(vec_id AS VARCHAR))", 12)
    return f"""
    WITH n AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS c_id, v AS cv, norm AS cn
      FROM n ORDER BY {cent_h}, vec_id LIMIT {n_cells}
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.c_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cn) DESC,
                          c.c_id ASC) AS rn
        FROM n, cent c
      ) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN n x ON x.vec_id = a.vec_id
      JOIN n y ON y.vec_id = b.vec_id
      WHERE list_dot_product(x.v, y.v) / (x.norm * y.norm) >= {threshold}
    )
    SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
    FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id
    ORDER BY a.vec_id
    """


@register("semantic_dedup", oracle=_semantic_dedup_sql(_SD_CELLS, _SD_THRESHOLD))
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: deterministic coarse
    quantizer cells, exact cosine within cells, keep the min-id
    representative per near-dup pair set. The seeded centroids make the
    whole clustered approximation oracle-replayable, not rows-only
    (operators/similarity.py semantic_dedup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, n_cells=_SD_CELLS, threshold=_SD_THRESHOLD
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Deterministic domain-mix resampling
# ---------------------------------------------------------------------------

_MIX_HEX = _sql_hex_int("md5(CAST(doc_id AS VARCHAR) || 'mix')", 12)


@register(
    "domain_mix_sample",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    r AS (
      SELECT lang, n_docs,
             GREATEST(CAST(((SELECT MIN(n_docs) FROM c) * {SA.BUCKETS})
                           // n_docs AS BIGINT), 1) AS rate_bp
      FROM c
    ),
    k AS (
      SELECT d.lang
      FROM documents d JOIN r USING (lang)
      WHERE ({_MIX_HEX}) % {SA.BUCKETS} < rate_bp
    ),
    kc AS (SELECT lang, COUNT(*) AS n_kept FROM k GROUP BY 1)
    SELECT r.lang, r.n_docs, r.rate_bp,
           CAST(COALESCE(kc.n_kept, 0) AS BIGINT) AS n_kept
    FROM r LEFT JOIN kc USING (lang) ORDER BY r.lang
    """,
)
def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing audit: every language downsampled to the
    smallest language's size with an integer basis-point rate and the md5
    key bucket (operators/sampling.py equalize_groups) — reproducible under
    any partitioning. Group stats broadcast; the fact pass is map-only."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    floor_n = counts.agg(F.min("n_docs").alias("__min_n__"))
    rates = counts.crossJoin(F.broadcast(floor_n)).select(
        "lang",
        "n_docs",
        F.greatest(
            F.expr(f"(__min_n__ * {SA.BUCKETS}) div n_docs"), F.lit(1)
        ).alias("rate_bp"),
    )
    kept = (
        SA.equalize_groups(docs, key="doc_id", group="lang")
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "rate_bp",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# PII redaction as a checkable transform
# ---------------------------------------------------------------------------

_E, _P, _I = (T.PII_PATTERNS[k] for k in ("email", "phone", "ipv4"))


@register(
    "pii_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_E}'))
              + len(regexp_extract_all(lower(text), '{_P}'))
              + len(regexp_extract_all(lower(text), '{_I}')) AS BIGINT)
             AS n_redactions,
           length(red) AS redacted_len,
           md5(red) AS redacted_md5
    FROM (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(regexp_replace(lower(text),
               '{_E}', '<EMAIL>', 'g'),
               '{_P}', '<PHONE>', 'g'),
               '{_I}', '<IPV4>', 'g') AS red
      FROM documents
    ) ORDER BY doc_id
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub transform itself (pii_scan is the audit): per doc, total
    redaction count plus length and md5 of the post-redaction text — the
    md5 proves byte parity of the full chained-replace pipeline across
    engines. Map-only, chained JVM regexp_replace."""
    docs = load_table(spark, sf_dir, "documents")
    red = T.redact_pii(docs, out_col="__red__")
    return (
        red.select(
            "doc_id",
            (
                F.col("pii_email_count")
                + F.col("pii_phone_count")
                + F.col("pii_ipv4_count")
            )
            .cast("bigint")
            .alias("n_redactions"),
            F.length("__red__").alias("redacted_len"),
            F.md5("__red__").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Int8-quantized similarity search
# ---------------------------------------------------------------------------

_QZ_K = 10


@register(
    "quantized_cosine_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS maxabs
      FROM embeddings
    ),
    q8 AS (
      SELECT vec_id, v, norm,
             CASE WHEN maxabs = 0.0
                  THEN list_transform(v, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(v,
                         x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5)
                                        AS BIGINT) AS DOUBLE)) END AS q
      FROM n
    ),
    scored AS (
      SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
             list_dot_product(a.q, b.q)
               / (sqrt(list_dot_product(a.q, a.q))
                  * sqrt(list_dot_product(b.q, b.q))) AS qcos,
             list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
      FROM q8 a JOIN q8 b ON b.vec_id != a.vec_id
      WHERE a.vec_id < 10
    )
    SELECT q_vec_id, n_vec_id, CAST(rank AS INT) AS rank, qcos, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                   ORDER BY qcos DESC, n_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_QZ_K} ORDER BY q_vec_id, rank
    """,
)
def q_quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k (query vecs = vec_id < 10) with the true
    float cosine alongside — the memory-lever variant of cosine_topk whose
    integer arithmetic stays exact in doubles, making a quantized index
    oracle-checkable end to end (operators/similarity.py quantize_int8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    return S.quantized_cosine_topk(emb, qids, k=_QZ_K).orderBy(
        "q_vec_id", "rank"
    )


@register(
    "hard_negatives_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS maxabs
      FROM embeddings
    ),
    q8 AS (
      SELECT vec_id, label, v, norm,
             CASE WHEN maxabs = 0.0
                  THEN list_transform(v, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(v,
                         x -> CAST(CAST(floor(x * 127.0 / maxabs + 0.5)
                                        AS BIGINT) AS DOUBLE)) END AS q
      FROM n
    ),
    scored AS (
      SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
             a.label AS q_label, b.label AS n_label,
             list_dot_product(a.q, b.q)
               / (sqrt(list_dot_product(a.q, a.q))
                  * sqrt(list_dot_product(b.q, b.q))) AS qcos,
             list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
      FROM q8 a JOIN q8 b
        ON b.vec_id != a.vec_id AND b.label != a.label
      WHERE a.vec_id < 10
    )
    SELECT q_vec_id, n_vec_id, q_label, n_label,
           CAST(rank AS INT) AS rank, qcos, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                   ORDER BY qcos DESC, n_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_QZ_K} ORDER BY q_vec_id, rank
    """,
)
def q_hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector
    (vec_id < 10), the top-k most-similar corpus vectors whose LABEL
    differs — the near-misses an embedding model learns the most from.
    Same int8-quantized exact-in-doubles cosine as quantized_cosine_topk
    (ranks engine-deterministic → fully hash-replayable), query side
    broadcast, corpus side map-scored, per-query window top-k. The
    100 TB shape swaps the brute-force corpus scan for IVF candidate
    generation and keeps the label-exclusion + rerank identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    return S.quantized_cosine_topk(
        emb, qids, k=_QZ_K, exclude_match_col="label"
    ).orderBy("q_vec_id", "rank")


# ---------------------------------------------------------------------------
# Chunking and keyword extraction
# ---------------------------------------------------------------------------

_CHUNK, _OVERLAP = 32, 8
_KW_K = 3


@register(
    "chunk_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
      FROM documents WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= {_CHUNK} THEN 1
                  ELSE (n_tokens - {_CHUNK} + {_CHUNK - _OVERLAP} - 1)
                       // {_CHUNK - _OVERLAP} + 1 END AS n_chunks
      FROM t
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_CHUNK - _OVERLAP} AS BIGINT) AS tok_start,
           CAST(LEAST(i * {_CHUNK - _OVERLAP} + {_CHUNK}, n_tokens) AS BIGINT)
             AS tok_end
    FROM c, LATERAL unnest(generate_series(0, n_chunks - 1)) AS g(i)
    ORDER BY doc_id, chunk_id
    """,
)
def q_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk manifest ({chunk}=32 tokens, overlap 8): the
    doc → token-range table a tokenizer/embedder consumes. Map-only with
    O(n_tokens/step) bounded fanout (operators/packing.py chunk_manifest)."""
    docs = load_table(spark, sf_dir, "documents")
    return PK.chunk_manifest(
        docs, chunk_tokens=_CHUNK, overlap=_OVERLAP
    ).orderBy("doc_id", "chunk_id")


@register(
    "doc_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY 1
    ),
    scored AS (
      SELECT doc_id, tok, tf, df, tf * 1000000 / df AS score
      FROM tf JOIN dfreq USING (tok)
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, tok, tf, df, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tok ASC) AS rank
      FROM scored
    ) WHERE rank <= {_KW_K} ORDER BY doc_id, rank
    """,
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by tf/df ranking — identical order to
    tf-idf (idf is monotone in df) without the cross-engine ln drift
    (operators/text.py doc_keywords)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.doc_keywords(docs, k=_KW_K).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# Oracle-checkable ANN (integerized hyperplane buckets)
# ---------------------------------------------------------------------------

_AI_PLANES, _AI_TABLES, _AI_K = 6, 4, 10


def _ann_int_sql(n_tables: int, n_planes: int, k: int) -> str:
    from network_iq_spark.queries._fragments import _int_sig_ctes

    return f"""
    WITH {_int_sig_ctes(n_tables, n_planes)},
    cand AS (
      SELECT DISTINCT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id
      FROM sigs a JOIN sigs b
        ON a.t = b.t AND a.bucket = b.bucket AND b.vec_id != a.vec_id
      WHERE a.vec_id < 10
    ),
    n AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    scored AS (
      SELECT c.q_vec_id, c.n_vec_id,
             list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
      FROM cand c
      JOIN n a ON a.vec_id = c.q_vec_id
      JOIN n b ON b.vec_id = c.n_vec_id
    )
    SELECT q_vec_id, n_vec_id, CAST(rank AS INT) AS rank, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, n_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k} ORDER BY q_vec_id, rank
    """


@register(
    "ann_int_cosine_topk",
    oracle=_ann_int_sql(_AI_TABLES, _AI_PLANES, _AI_K),
)
def q_ann_int_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 from integerized hyperplane buckets (query vecs =
    vec_id < 10) — unlike the float-signature ann_cosine_topk (rows-only by
    necessity), the integer buckets replay exactly in SQL, so this ANN
    variant is hash-checked end to end: weight derivation, quantization,
    bucket bits, candidate join, and cosine ranks
    (operators/similarity.py cosine_topk_int_lsh)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    return S.cosine_topk_int_lsh(
        emb, qids, k=_AI_K, n_planes=_AI_PLANES, n_tables=_AI_TABLES
    ).orderBy("q_vec_id", "rank")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

_WIN_W = 4


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH t AS ({_TOKS}),
    g AS (
      SELECT doc_id,
             CAST(i - 1 AS BIGINT) AS pos,
             CAST({_sql_hex_int("substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 12)", 12)} AS BIGINT) AS h,
             len(t) - 2 AS m
      FROM t, LATERAL unnest(generate_series(1, len(t) - 2)) AS s(i)
      WHERE len(t) >= {2 + _WIN_W}
    ),
    win AS (
      SELECT g.doc_id, w.j, g.pos, g.h
      FROM g, LATERAL unnest(generate_series(0, g.m - {_WIN_W})) AS w(j)
      WHERE g.pos BETWEEN w.j AND w.j + {_WIN_W - 1}
    ),
    picks AS (
      SELECT doc_id, pos, h FROM (
        SELECT doc_id, j, pos, h,
               ROW_NUMBER() OVER (PARTITION BY doc_id, j
                                  ORDER BY h ASC, pos DESC) AS rn
        FROM win
      ) WHERE rn = 1
    )
    SELECT DISTINCT doc_id, pos, h FROM picks ORDER BY doc_id, pos
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local fingerprints: rightmost-min pick per window
    of {w}=4 consecutive 3-gram hashes, distinct (pos, hash) set per doc.
    Position-robust overlap detection — any shared >=7-token substring
    yields a shared fingerprint (operators/text.py
    winnowing_fingerprints; map-only + explode, argmin never shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    # the operator's array_distinct already dedups picks within a doc, so
    # no distinct shuffle is needed here
    return T.winnowing_fingerprints(docs, w=_WIN_W).orderBy("doc_id", "pos")


@register(
    "winnow_overlap_pairs",
    oracle=f"""
    WITH t AS ({_TOKS}),
    g AS (
      SELECT doc_id,
             CAST(i - 1 AS BIGINT) AS pos,
             CAST({_sql_hex_int("substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 12)", 12)} AS BIGINT) AS h,
             len(t) - 2 AS m
      FROM t, LATERAL unnest(generate_series(1, len(t) - 2)) AS s(i)
      WHERE len(t) >= {2 + _WIN_W}
    ),
    win AS (
      SELECT g.doc_id, w.j, g.pos, g.h
      FROM g, LATERAL unnest(generate_series(0, g.m - {_WIN_W})) AS w(j)
      WHERE g.pos BETWEEN w.j AND w.j + {_WIN_W - 1}
    ),
    fp AS (
      SELECT DISTINCT doc_id, h FROM (
        SELECT doc_id, j, pos, h,
               ROW_NUMBER() OVER (PARTITION BY doc_id, j
                                  ORDER BY h ASC, pos DESC) AS rn
        FROM win
      ) WHERE rn = 1
    )
    SELECT doc_a, doc_b, n_shared FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_shared
      FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ) ORDER BY n_shared DESC, doc_a ASC, doc_b ASC LIMIT 50
    """,
)
def q_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 overlapping doc pairs by shared winnowing fingerprints — the
    pair-level consumer of winnowing_fingerprints (MOSS-style overlap
    report). One content-uniform shuffle on the fingerprint hash; the
    distinct-hash projection keeps the self-join fanout at fingerprint
    density (~2/(w+1) of grams), not token count."""
    fp = T.winnowing_fingerprints(
        load_table(spark, sf_dir, "documents"), w=_WIN_W
    ).select("doc_id", "h").distinct()
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return pairs.orderBy(
        F.col("n_shared").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(50)


@register("semantic_dedup_scaled", bench_only=True)  # rows-only BY DESIGN (see docstring)
def q_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path variant of ``semantic_dedup``: ``n_cells=None`` turns
    on the cells-∝-N discipline (auto_n_cells) and the DISTRIBUTED
    two-level assigner (ivf_assign_dist) — only the √k super-reps ride the
    task closure; the centroid table stays a DataFrame and vectors resolve
    their winning group's centroids via a cogrouped equi-join, removing
    the engine's last driver-side data dependence (collecting all k
    centroids grows ∝ N under the auto-cells rule). Rows-only by design:
    matmul summation order can differ from a SQL fold in the last ulp of a
    cosine, which can flip an argmax on exact ties, so this plan is
    deliberately NOT pinned to a static SQL oracle — the fixed-cell
    ``semantic_dedup`` twin is the fully oracle-checked configuration, the
    integer-quantized ``ivf_centroid_join_topk`` pins the distributed
    assigner itself to a DuckDB oracle, and
    ``test_semantic_dedup_autocells_matches_dist_assignment_endpoint``
    recomputes the flags independently. Scaling: docs/SCALE.md."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, n_cells=None, threshold=_SD_THRESHOLD).orderBy(
        "vec_id"
    )


def _ann_int_multiprobe_sql(n_tables: int, n_planes: int, k: int) -> str:
    from network_iq_spark.queries._fragments import _int_sig_ctes

    probe_variants = "\n      UNION ALL\n      ".join(
        ["SELECT vec_id, t, bucket FROM sigs WHERE vec_id < 10"]
        + [
            f"SELECT vec_id, t, xor(bucket, {1 << p}) AS bucket "
            f"FROM sigs WHERE vec_id < 10"
            for p in range(n_planes)
        ]
    )
    return f"""
    WITH {_int_sig_ctes(n_tables, n_planes)},
    probes AS (
      {probe_variants}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id
      FROM probes a JOIN sigs b
        ON a.t = b.t AND a.bucket = b.bucket AND b.vec_id != a.vec_id
    ),
    n AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    scored AS (
      SELECT c.q_vec_id, c.n_vec_id,
             list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
      FROM cand c
      JOIN n a ON a.vec_id = c.q_vec_id
      JOIN n b ON b.vec_id = c.n_vec_id
    )
    SELECT q_vec_id, n_vec_id, CAST(rank AS INT) AS rank, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, n_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k} ORDER BY q_vec_id, rank
    """


@register(
    "ann_int_multiprobe_topk",
    oracle=_ann_int_multiprobe_sql(_AI_TABLES, _AI_PLANES, _AI_K),
)
def q_ann_int_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-1 multi-probe over the INTEGERIZED LSH buckets: unlike the
    float multi-probe sibling (rows-only by necessity), the XOR bucket
    expansion replays exactly in SQL — so the recall-raising probe scheme
    itself is hash-checked end to end, not just asserted by a recall test
    (operators/similarity.py cosine_topk_int_lsh, multiprobe=True).
    Measured recall@10 at sf0.01: 0.67 vs 0.18 single-probe at this
    deliberately coarse 6-plane/4-table config — the probe scheme is the
    cheap recall lever when re-indexing with more tables is too
    expensive; the float path at 4 planes × 16 tables reaches 1.000."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    return S.cosine_topk_int_lsh(
        emb, qids, k=_AI_K, n_planes=_AI_PLANES, n_tables=_AI_TABLES,
        multiprobe=True,
    ).orderBy("q_vec_id", "rank")


@register(
    "fertility_by_lang",
    oracle="""
    WITH per AS (
      SELECT lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_w,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS n_b
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_w) AS BIGINT) AS n_words,
           CAST(SUM(n_b) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN SUM(n_w) = 0 THEN 0.0
                ELSE CAST(SUM(n_b) AS DOUBLE) / CAST(SUM(n_w) AS DOUBLE) END
             AS fertility
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def q_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — BPE-ish segments per whitespace
    word, the standard multilingual-tokenizer health metric (fertility
    far above ~1.3 for a language means its text pays more sequence
    length per word than the tokenizer's home languages). Integer token
    counts → deterministic ratio; one combinable groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(T.tokens("text")).alias("n_w"),
        F.size(T.tokens("text", T.BPE_RE)).alias("n_b"),
    )
    sw, sb = F.sum("n_w"), F.sum("n_b")
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            sw.alias("n_words"),
            sb.alias("n_bpe_tokens"),
            F.when(sw == 0, F.lit(0.0))
            .otherwise(sb.cast("double") / sw.cast("double"))
            .alias("fertility"),
        )
        .orderBy("lang")
    )


_WS_K = 3
_WS_POW48 = float(1 << 48)


@register(
    "weighted_sample_per_source",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             CAST(FLOOR(ln((CAST(({{hex}}) AS DOUBLE) + 1.0) / {_WS_POW48!r})
                  / CAST(n_chars AS DOUBLE) * 1000000000.0) AS BIGINT)
               AS es_key_units
      FROM documents
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY es_key_units DESC, doc_id
             ) AS INT) AS rank
      FROM keyed
    )
    SELECT source, rank, doc_id, n_chars, es_key_units
    FROM ranked WHERE rank <= {_WS_K} ORDER BY source, rank
    """.replace(
        "{hex}", _sql_hex_int("md5(CAST(doc_id AS VARCHAR))", 12)
    ),
)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 3 docs per source,
    length-weighted — the Efraimidis-Spirakis one-pass reservoir with an
    md5-derived uniform draw, so the sample is identical on every engine,
    retry, and partitioning (the property a reproducible mixture build
    needs). Key quantized to integer nano-units, id tiebreak
    (operators/sampling.py weighted_sample_k)."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.weighted_sample_k(docs, "source", "n_chars", k=_WS_K)
