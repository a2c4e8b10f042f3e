"""Text-analysis queries: token stats, quality scoring, PSI drift, URL
canonicalization, BPE tokenization, HTML/WARC extraction, language ID,
C4/Gopher quality rules. Split out of llmdata.py in r10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from network_iq_spark.operators import text as T
from network_iq_spark.registry import register
from network_iq_spark.sources import load_table

from network_iq_spark.queries._fragments import (  # noqa: F401
    _QUALITY_CORE,
    _TOKS,
)

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
      len(text) AS n_chars_measured,
      len(t) AS n_tokens,
      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
      CASE WHEN len(t) = 0 THEN 0.0
           ELSE CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t)
      END AS avg_token_len
    FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents)
    ORDER BY doc_id
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace-word + BPE-ish regex) — all JVM-side
    regexp, zero Python; integer counts → deterministic ratios."""
    docs = load_table(spark, sf_dir, "documents")
    return T.token_stats(docs).orderBy("doc_id")


@register(
    "quality_scores",
    oracle=f"{_QUALITY_CORE} ORDER BY doc_id",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training quality filter features: length/stopword/punctuation
    ratios folded into a clamped [0,1] score."""
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_score(docs).orderBy("doc_id")


_PSI_BINS, _PSI_QUANT = 10, 1_000_000
_PSI_SPLIT = 250  # doc_id window split, same convention as the drift pair


@register(
    "quality_psi_drift",
    oracle=f"""
    WITH quality AS ({_QUALITY_CORE}),
    binned AS (
      SELECT doc_id,
             LEAST({_PSI_BINS - 1},
                   CAST(FLOOR(quality_score * {_PSI_BINS}) AS INT)) AS bin
      FROM quality
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN doc_id < {_PSI_SPLIT} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN doc_id >= {_PSI_SPLIT} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts),
    rates AS (
      SELECT c.bin, c.n_ref, c.n_cur,
             CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + {_PSI_BINS}) AS p,
             CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + {_PSI_BINS}) AS q
      FROM counts c CROSS JOIN tot t
    )
    SELECT bin, n_ref, n_cur, p AS rate_ref, q AS rate_cur,
           CAST(FLOOR((p - q) * ln(p / q) * {_PSI_QUANT}) AS BIGINT)
             AS psi_contrib_micro
    FROM rates ORDER BY bin
    """,
)
def q_quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index over the quality-score distribution
    between the reference window (doc_id < 250) and the current window —
    THE standard production drift gauge (PSI < 0.1 stable, > 0.25 act),
    completing the drift family (`embedding_drift` = representation
    space, `vocab_drift_top_movers` = token space, this = quality-filter
    space). Ten fixed-width bins; Laplace-smoothed rates from exact
    integer counts so p/q are deterministic doubles; the per-bin
    contribution is floor-quantized to integer micro-units exactly like
    the surprisal operator's mnats (ln at this quantization is
    cross-engine stable — driver-green precedent). One quality map, one
    bin aggregate, one 2-scalar broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    q = T.quality_score(docs).select("doc_id", "quality_score")
    binned = q.select(
        "doc_id",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(F.col("quality_score") * _PSI_BINS).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("doc_id") < _PSI_SPLIT, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("doc_id") >= _PSI_SPLIT, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + _PSI_BINS)
    qq = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + _PSI_BINS)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            p.alias("rate_ref"),
            qq.alias("rate_cur"),
            F.floor(
                (p - qq) * F.log(p / qq) * _PSI_QUANT
            ).cast("bigint").alias("psi_contrib_micro"),
        )
        .orderBy("bin")
    )


def _canon_url_sql() -> str:
    """DuckDB twin of operators/text.py canonical_url — the identical
    RE2 chain over identically-synthesized URL variants."""
    host = (
        "regexp_replace(lower(regexp_extract(u,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':(80|443)$', '')"
    )
    path = (
        "CASE WHEN regexp_extract(u,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = '' THEN '/'"
        " ELSE regexp_replace(regexp_extract(u,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '(.)/$', '\\1')"
        " END"
    )
    kept = (
        "list_sort(list_filter(str_split(regexp_extract(u, '\\?([^#]*)', 1),"
        " '&'), p -> p != '' AND NOT regexp_matches(p,"
        f" '{T.URL_TRACKING_RE}')))"
    )
    return f"""
    WITH v AS (
      SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS var FROM documents
    ),
    urls AS (
      SELECT doc_id,
        CASE var
          WHEN 0 THEN 'https://Example.COM/docs/' || base || '/'
          WHEN 1 THEN 'https://example.com/docs/' || base || '?a=1&b=2'
          WHEN 2 THEN 'https://example.com/docs/' || base
                      || '/?b=2&a=1&utm_source=feed'
          ELSE 'HTTPS://example.com:443/docs/' || base || '#frag'
        END AS u
      FROM v
    ),
    canon AS (
      SELECT doc_id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
        || {host} || {path}
        || CASE WHEN len({kept}) > 0
                THEN '?' || array_to_string({kept}, '&') ELSE '' END
          AS canonical
      FROM (SELECT doc_id, regexp_replace(u, '#.*$', '', 'g') AS u FROM urls)
    )
    SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_urls,
           MIN(doc_id) AS keeper
    FROM canon GROUP BY canonical ORDER BY canonical
    """


@register("url_canonical_dedup", oracle=_canon_url_sql())
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization → exact dedup, the crawl-frontier step before
    any content fetch: four deterministic variants per page (host case +
    trailing slash, sorted params, unsorted params + utm tracking +
    slash, scheme case + default port + fragment) must collapse to two
    canonical forms per base page — one without query, one with the
    sorted ?a=1&b=2. The chain (operators/text.py canonical_url) is
    JVM-only, RE2-compatible, and hash-checked on the FULL canonical
    string. Map-only + one groupBy on the canonical key."""
    docs = load_table(spark, sf_dir, "documents")
    base = F.expr("doc_id div 4").cast("string")
    var = F.col("doc_id") % 4
    url = (
        F.when(var == 0, F.concat(F.lit("https://Example.COM/docs/"), base, F.lit("/")))
        .when(var == 1, F.concat(F.lit("https://example.com/docs/"), base, F.lit("?a=1&b=2")))
        .when(
            var == 2,
            F.concat(
                F.lit("https://example.com/docs/"),
                base,
                F.lit("/?b=2&a=1&utm_source=feed"),
            ),
        )
        .otherwise(
            F.concat(F.lit("HTTPS://example.com:443/docs/"), base, F.lit("#frag"))
        )
    )
    urls = docs.select("doc_id", url.alias("u"))
    canon = urls.select("doc_id", T.canonical_url(F.col("u")).alias("canonical"))
    return (
        canon.groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("doc_id").alias("keeper"),
        )
        .orderBy("canonical")
    )


def _bpe_sql() -> str:
    """DuckDB twin of operators/text.py bpe_token_stats: the identical
    merge chain (leftmost-first replace over the '|'-marker symbol
    representation — a marker pins each symbol start, the trailing
    space its end, so a merge never crosses a symbol boundary) inside a
    list_transform over the word tokens."""
    seg = "regexp_replace(w, '(.)', '|\\1 ', 'g')"
    for a, b in T.BPE_MERGES:
        seg = f"replace({seg}, '|{a} |{b} ', '|{a}{b} ')"
    seg = f"trim({seg})"
    return f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(toks,
                w -> len(str_split({seg}, ' ')))), 0) AS BIGINT)
             AS n_bpe_tokens,
           CASE WHEN COALESCE(list_sum(list_transform(toks,
                     w -> len(str_split({seg}, ' ')))), 0) = 0 THEN 0.0
                ELSE CAST(n_chars AS DOUBLE)
                     / list_sum(list_transform(toks,
                         w -> len(str_split({seg}, ' '))))
           END AS chars_per_token
    FROM t ORDER BY doc_id
    """


@register("bpe_token_stats", oracle=_bpe_sql())
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-pair-encoding merge application (the GPT-2 mechanism,
    fixed public merge table instead of a trained one): every word
    explodes to '|'-marked characters and the merge list applies
    left-to-right on the marker form — boundary-safe leftmost-first
    greedy merge, same encoding as bpe_train_merges — all
    inside one JVM projection (no Python, no explode; the chain runs in
    a transform lambda over the token array). Output: per-doc BPE token
    count and chars/token, the number a pipeline budgets context length
    with. The oracle runs the identical chain, so the tokenizer itself
    is hash-checked, not just its row count."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_token_stats(docs).orderBy("doc_id")


# Synthetic page wrapper for the HTML-extraction query: title/nav/footer
# boilerplate, a style block, a script whose body contains raw < and >
# (stripping tags before scripts would corrupt it — order is part of the
# contract), comments, and entities. The document text rides in the <p>.
_HTML_PRE1 = (
    '<html><head><title>Doc '
)
_HTML_PRE2 = (
    '</title><style>p { color: #333; }</style>'
    '<script type="text/javascript">var t = "x < y && y > z";</script>'
    '</head><body><!-- layout --><nav><a href="/">Home</a> &gt; '
    '<a href="/docs">Docs</a></nav><h1>Doc '
)
_HTML_PRE3 = "</h1><p>"
_HTML_POST = (
    "</p><footer>&copy; 2026 Example &amp; Co.&nbsp;"
    "All rights reserved.</footer></body></html>"
)


def _html_extract_sql() -> str:
    """DuckDB twin of operators/text.py html_to_text: the IDENTICAL
    pattern/entity chain, applied to the identically-constructed page."""
    x = "html"
    for pat in T.HTML_STRIP_PATTERNS:
        x = "regexp_replace(" + x + ", '" + pat + "', ' ', 'gs')"
    for src, dst in T.HTML_ENTITIES:
        x = "replace(" + x + ", '" + src + "', '" + dst.replace("'", "''") + "')"
    # explicit class, NOT \s: Java \s includes \x0B, RE2 \s does not
    x = "trim(regexp_replace(" + x + ", '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))"
    return (
        "WITH h AS (SELECT doc_id, "
        "'" + _HTML_PRE1 + "' || CAST(doc_id AS VARCHAR) || "
        "'" + _HTML_PRE2 + "' || CAST(doc_id AS VARCHAR) || "
        "'" + _HTML_PRE3 + "' || text || '" + _HTML_POST + "' AS html "
        "FROM documents) "
        "SELECT doc_id, " + x + " AS text, "
        "CAST(len(" + x + ") AS BIGINT) AS n_chars "
        "FROM h ORDER BY doc_id"
    )


@register("html_extract", oracle=_html_extract_sql())
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction, hash-checked on the FULL extracted string:
    each document is wrapped in a realistic page (script body containing
    raw ``<``/``>``, style block, comments, nav/footer boilerplate,
    entities), then stripped by the JVM-side regexp chain
    (operators/text.py html_to_text — RE2-compatible patterns, so DuckDB
    runs the identical chain). The extraction stage a 100 TB crawl corpus
    needs before any other text operator; map-only, whole-stage codegen,
    zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    page = docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE1),
            F.col("doc_id").cast("string"),
            F.lit(_HTML_PRE2),
            F.col("doc_id").cast("string"),
            F.lit(_HTML_PRE3),
            F.col("text"),
            F.lit(_HTML_POST),
        ).alias("html"),
    )
    out = T.html_to_text(page)
    return out.select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n_chars")
    ).orderBy("doc_id")


def _warc_extract_sql() -> str:
    """DuckDB twin of the whole WARC pipeline: the builder is
    deterministic (same page wrapper, status 200, chunked for odd
    doc_id), so after the reader undoes the WARC/HTTP/chunked framing the
    surviving content is exactly the html_extract page — the oracle
    re-states the framing as VALUES and replays the identical strip
    chain. Any defect in record framing, member-wise gunzip, HTTP parse,
    or chunked decoding changes a row and breaks the hash."""
    x = "html"
    for pat in T.HTML_STRIP_PATTERNS:
        x = "regexp_replace(" + x + ", '" + pat + "', ' ', 'gs')"
    for src, dst in T.HTML_ENTITIES:
        x = "replace(" + x + ", '" + src + "', '" + dst.replace("'", "''") + "')"
    x = "trim(regexp_replace(" + x + ", '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))"
    return (
        "WITH h AS (SELECT doc_id, "
        "'" + _HTML_PRE1 + "' || CAST(doc_id AS VARCHAR) || "
        "'" + _HTML_PRE2 + "' || CAST(doc_id AS VARCHAR) || "
        "'" + _HTML_PRE3 + "' || text || '" + _HTML_POST + "' AS html "
        "FROM documents) "
        "SELECT doc_id, 200 AS http_status, 'text/html' AS mime, "
        "doc_id % 2 = 1 AS chunked, "
        + x + " AS text, CAST(len(" + x + ") AS BIGINT) AS n_chars "
        "FROM h ORDER BY doc_id"
    )


@register("warc_extract_stats", oracle=_warc_extract_sql())
def q_warc_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC → HTTP → HTML → text, end to end — the ingest stage a 100 TB
    crawl corpus actually starts from (Common Crawl .warc.gz: one gzip
    member per record). Each Arrow batch of documents becomes a REAL
    multi-member .warc.gz in-plan (sources/warc.py: warcinfo record +
    one HTTP response record per doc, chunked transfer coding for odd
    doc_ids — the builder-side fixture trick of the codec tier), then
    the actual reader explodes it back to records (member-aware gunzip,
    WARC framing, HTTP status/header parse, dechunk) and the JVM-side
    html_to_text chain extracts the text. Map-only end to end until the
    final sort: at scale this is binaryFile-per-task parallelism with
    zero shuffle. Hash-checked on the FULL extracted string plus the
    status/mime/chunked columns the reader recovered."""
    import pandas as pd

    from network_iq_spark.operators import ensure_parallelism
    from network_iq_spark.sources import warc as W

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def build(it):
        for pdf in it:
            recs = [
                W.build_warc_record(
                    "warcinfo",
                    b"software: network-iq-spark\r\n",
                    record_seq=0,
                    content_type="application/warc-fields",
                )
            ]
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                page = (
                    f"{_HTML_PRE1}{did}{_HTML_PRE2}{did}{_HTML_PRE3}"
                    f"{text}{_HTML_POST}"
                ).encode("utf-8")
                http = W.build_http_response(
                    page, status=200, chunked=bool(did % 2)
                )
                recs.append(
                    W.build_warc_record(
                        "response",
                        http,
                        target_uri=f"https://example.org/doc/{did}",
                        record_seq=did + 1,
                    )
                )
            yield pd.DataFrame({"content": [W.encode_warc_gz(recs)]})

    blobs = docs.mapInPandas(build, schema="content binary")
    recs = W.warc_records(blobs).filter(F.col("rec_type") == "response")
    page = recs.select(
        F.regexp_extract("target_uri", r"doc/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "http_status",
        "mime",
        "chunked",
        F.col("body").cast("string").alias("html"),
    )
    out = T.html_to_text(page)
    return out.select(
        "doc_id",
        F.col("http_status").cast("int").alias("http_status"),
        "mime",
        "chunked",
        "text",
        F.length("text").cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


def _lang_sql() -> str:
    langs = list(T.LANG_MARKERS)
    score_cols = ",\n      ".join(
        f"CASE WHEN len(t) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_filter(t, x -> x IN {T.LANG_MARKERS[lang]!r})) AS DOUBLE)"
        f" / len(t) END AS score_{lang}"
        for lang in langs
    )
    ladder = []
    for i, lang in enumerate(langs):
        conds = [f"score_{lang} > 0"] + [
            f"score_{lang} >= score_{later}" for later in langs[i + 1 :]
        ]
        ladder.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    ladder_sql = "\n        ".join(ladder)
    return f"""
    WITH scored AS (
      SELECT doc_id,
      {score_cols}
      FROM ({_TOKS})
    )
    SELECT doc_id, {', '.join('score_' + lang for lang in langs)},
      CASE
        {ladder_sql}
        ELSE 'unknown' END AS pred_lang
    FROM scored ORDER BY doc_id
    """


@register("lang_id", oracle=_lang_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language-ID heuristic with a deterministic argmax
    ladder (ties go to the earlier language)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.lang_id(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Named quality-rule sets: C4 line filter + Gopher document flags
# ---------------------------------------------------------------------------

# Deterministic multi-line article fixture (the html_extract pattern): the
# synthetic corpus is single-line and punctuation-free, so the line-grain
# C4 rules need structure — each doc's tokens are folded into 8-word lines
# decorated by (doc_id + line_idx) residue: bullet lines (no terminal
# punct), "javascript" lines, bare lines, and clean sentences. Both engines
# build the IDENTICAL text, then replay the IDENTICAL filter.
_C4_LINES_SPARK = (
    "if(size(_toks) = 0, array(), "
    "transform(sequence(0, cast(ceil(size(_toks) / 8.0) as int) - 1), i -> "
    "CASE WHEN (doc_id + i) % 5 = 0 "
    "  THEN concat('• ', array_join(slice(_toks, i*8+1, 8), ' ')) "
    "WHEN (doc_id + i) % 7 = 0 "
    "  THEN concat(array_join(slice(_toks, i*8+1, 8), ' '), ' javascript') "
    "WHEN (doc_id + i) % 3 = 0 THEN array_join(slice(_toks, i*8+1, 8), ' ') "
    "ELSE concat(array_join(slice(_toks, i*8+1, 8), ' '), '.') END))"
)

_C4_LINES_DUCK = (
    "list_transform(range(0, CAST(ceil(len(t) / 8.0) AS INT)), i -> "
    "CASE WHEN (doc_id + i) % 5 = 0 "
    "  THEN chr(8226) || ' ' || array_to_string(list_slice(t, i*8+1, i*8+8), ' ') "
    "WHEN (doc_id + i) % 7 = 0 "
    "  THEN array_to_string(list_slice(t, i*8+1, i*8+8), ' ') || ' javascript' "
    "WHEN (doc_id + i) % 3 = 0 "
    "  THEN array_to_string(list_slice(t, i*8+1, i*8+8), ' ') "
    "ELSE array_to_string(list_slice(t, i*8+1, i*8+8), ' ') || '.' END)"
)


@register(
    "c4_line_filter",
    oracle=f"""
    WITH t AS ({_TOKS}),
    built AS (
      SELECT doc_id,
             array_to_string({_C4_LINES_DUCK}, chr(10)) AS text
      FROM t
    ),
    split_again AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM built
    ),
    filtered AS (
      SELECT doc_id, text, len(ls) AS n_lines,
             list_filter(ls, l ->
               regexp_matches(l, '[.!?"]$')
               AND len(regexp_extract_all(lower(l), '[a-z0-9]+')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kl
      FROM split_again
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kl) AS BIGINT) AS kept_lines,
           (len(kl) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{{')) AS keep_doc,
           -- empty list: DuckDB array_to_string → NULL, Spark array_join → ''
           COALESCE(array_to_string(kl, chr(10)), '') AS kept_text
    FROM filtered ORDER BY doc_id
    """,
)
def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NAMED C4 cleaning rules (Raffel et al. 2020 §2.2) end to end:
    keep lines ending in terminal punctuation with ≥5 words and no
    "javascript"; keep documents with ≥3 surviving lines and no
    "lorem ipsum"/"{{". Runs on a deterministic multi-line article built
    in-plan from each doc's tokens (bullet/bare/javascript/sentence lines
    by residue — the html_extract fixture pattern), hash-checked on the
    FULL cleaned text. Map-only, array lambdas in codegen, zero Python
    (operators/text.py c4_line_filter)."""
    docs = load_table(spark, sf_dir, "documents")
    fixture = docs.select(
        "doc_id", T.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        F.array_join(F.expr(_C4_LINES_SPARK), "\n").alias("text"),
    )
    return T.c4_line_filter(fixture).orderBy("doc_id")


_GOPHER_STOP_SQL = " + ".join(
    f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
    for w in T.GOPHER_STOPS
)


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             string_split(text, chr(10)) AS ls
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, w -> length(w)))
                            AS DOUBLE) / CAST(len(toks) AS DOUBLE) END
               AS mean_word_len,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(CAST(
                         (length(text) - length(replace(text, '#', '')))
                         + (length(text) - length(replace(text, '...', ''))) / 3
                         + (length(text) - length(replace(text, chr(8230), '')))
                       AS BIGINT) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END
               AS symbol_ratio,
             CASE WHEN len(ls) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(ls, l ->
                         ltrim(l) LIKE chr(8226) || '%' OR ltrim(l) LIKE '- %'))
                       AS DOUBLE) / CAST(len(ls) AS DOUBLE) END
               AS bullet_line_ratio,
             CASE WHEN len(ls) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(ls, l ->
                         regexp_matches(rtrim(l), '(\\.\\.\\.|' || chr(8230) || ')$')))
                       AS DOUBLE) / CAST(len(ls) AS DOUBLE) END
               AS ellipsis_line_ratio,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                       AS DOUBLE) / CAST(len(toks) AS DOUBLE) END
               AS frac_alpha_words,
             CAST({_GOPHER_STOP_SQL} AS BIGINT) AS n_stop_hits
      FROM t
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio <= 0.1
            AND bullet_line_ratio <= 0.9
            AND ellipsis_line_ratio <= 0.3
            AND frac_alpha_words >= 0.8
            AND n_stop_hits >= 2) AS keep
    FROM m ORDER BY doc_id
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NAMED Gopher quality rules (Rae et al. 2021 Appendix A) as
    measured per-document columns + combined keep flag — the exact filter
    a corpus card can cite, next to the generic quality_score. Word-count
    and stop-word rules discriminate on this corpus; the symbol/bullet/
    ellipsis rules are structurally zero on the synthetic single-line
    docs but computed honestly (and exercised with real structure in the
    operator's unit tests). Map-only, deterministic integer ratios
    (operators/text.py gopher_quality_flags)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.gopher_quality_flags(docs).orderBy("doc_id")
