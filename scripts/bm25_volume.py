#!/usr/bin/env python
"""Measure the BM25 postings-join volume with and without the df-ceiling
(VERDICT r8 item 3 evidence).

The scoring join fans out as Σ_term(q_df·df); ``max_df_ratio`` drops
terms with df/N above the ceiling from the postings BEFORE the join.
This script counts the (q_doc_id, doc_id, term) triples that actually
enter the scoring join — the shuffled volume — on the soak corpora at
1×/3×/10× of the sf0.1 row counts, uncapped vs ceiling 0.5. The soak
corpus is the worst case on purpose: a 31-word shared vocabulary makes
~30 of 31 terms stopwords (df/N ≈ 0.75–0.80), which is exactly the
crawled-corpus failure mode the ceiling exists for.

Run: python scripts/bm25_volume.py        # prints a markdown table
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_soak import build_corpus  # noqa: E402  (sibling script)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def triples(spark, d: str, max_df_ratio: float | None):
    """Replicates bm25_topk's candidate generation up to (but not
    including) the scoring projection and counts the join output —
    the exact volume the ceiling is meant to bound."""
    from pyspark.sql import functions as F

    from network_iq_spark.operators.text import ensure_parallelism, tokens
    from network_iq_spark.sources import load_table

    docs = ensure_parallelism(load_table(spark, d, "documents"))
    base = docs.select(F.col("doc_id"), tokens("text").alias("_toks"))
    tf = (
        base.select(F.col("doc_id"), F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df_ratio is not None:
        n_docs = docs.count()
        dfreq = dfreq.filter(
            F.col("df").cast("double") <= max_df_ratio * float(n_docs)
        )
    qterms = (
        docs.filter(F.col("doc_id") < 100)
        .select(F.col("doc_id").alias("q_doc_id"))
        .join(tf.select(F.col("doc_id").alias("q_doc_id"), "term"), "q_doc_id")
        .distinct()
    )
    return (
        qterms.join(tf.join(dfreq, "term"), "term")
        .filter(F.col("doc_id") != F.col("q_doc_id"))
        .count()
    )


def main() -> None:
    from network_iq_spark.session import get_spark

    spark = get_spark(app_name="bm25-volume")
    spark.sparkContext.setLogLevel("WARN")
    mults = [int(m) for m in os.environ.get("SOAK_MULTS", "1,3,10").split(",")]
    print("| corpus | uncapped triples | ceiling 0.5 triples | drop | uncapped s | capped s |")
    print("|---|---|---|---|---|---|")
    for m in mults:
        d = build_corpus(m)
        t0 = time.perf_counter()
        full = triples(spark, d, None)
        t_full = time.perf_counter() - t0
        t0 = time.perf_counter()
        capped = triples(spark, d, 0.5)
        t_cap = time.perf_counter() - t0
        drop = 1.0 - capped / full if full else 0.0
        print(
            f"| {m}× | {full:,} | {capped:,} | {drop:.1%} "
            f"| {t_full:.2f} | {t_cap:.2f} |"
        )


if __name__ == "__main__":
    main()
