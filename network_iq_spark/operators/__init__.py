"""Relational operator library (SURVEY.md §2).

Every operator is a lazy transformation returning a DataFrame; none collects.
Submodules map to the survey's inventory sections:

- ``aggregates``  — §2.4 A1-A15 (means, quantiles, boolean rates, grouped aggs)
- ``filters``     — §2.2 P1-P13 (cleansing, scope, validity, coerce casts)
- ``joins``       — §2.3 J1-J3 (broadcast baseline/dim enrichment joins)
- ``windows``     — §2.5 W1-W8 (rolling, lag, z-score, dedup-keep-last)
- ``topk``        — §2.6 O1-O7 (TakeOrderedAndProject top-k patterns)
- ``reshape``     — §2.7 U1-U4 (union, unpivot, rename)
- ``quality``     — §2.11 Q1-Q3 (data contracts)
- ``dedup``       — beyond-reference: exact / MinHash-LSH / SimHash / Jaccard
- ``similarity``  — beyond-reference: cosine top-k ANN over embeddings
- ``text``        — beyond-reference: lang-ID, quality score, tokens, fingerprint
"""

from pyspark.sql import DataFrame as _DataFrame


def ensure_parallelism(df: _DataFrame) -> _DataFrame:
    """Spread a scan across the cluster before CPU-dense per-row work
    (digest/regex-heavy map stages: dedup signatures, text analysis).

    Tiny test files arrive as ONE scan partition (single row-group), which
    serializes the map stage onto one core. At real scale a corpus scan
    already has >= cores splits and this is an identity — the repartition
    only fires when the input is under-split, so no extra exchange appears
    in the 100 TB plan shape.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
