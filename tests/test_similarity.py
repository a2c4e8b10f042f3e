"""Similarity-search tiers: the LSH ANN path must be a true subset
approximation of the exact baseline with usable recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from network_iq_spark.operators import similarity as S
from network_iq_spark.sources import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vecs(spark):
    emb = load_table(spark, SF, "embeddings")
    v = S.with_norm(emb.select("vec_id", S.as_double_vec("embedding").alias("v")))
    v.persist().count()
    yield v
    v.unpersist()


def test_lsh_results_subset_of_bucketmates_and_scored_exactly(spark, vecs):
    queries = vecs.select("vec_id").filter(F.col("vec_id") < 10)
    ann = S.cosine_topk_lsh(vecs.drop("norm"), queries, dim=64, k=10)
    exact = S.cosine_topk_bruteforce(
        vecs.filter(F.col("vec_id") < 10), vecs, k=500
    )
    exact_cos = {(r.q_vec_id, r.n_vec_id): r.cos for r in exact.collect()}
    ann_rows = ann.collect()
    assert len(ann_rows) > 0
    # every ANN cosine must equal the exact cosine for that pair
    for r in ann_rows:
        assert r.cos == pytest.approx(exact_cos[(r.q_vec_id, r.n_vec_id)], rel=1e-12)


def test_lsh_recall_at_10(spark, vecs):
    """Recall@10 of the multi-table config — recorded so a future
    tuning change that silently destroys recall fails loudly."""
    queries = vecs.select("vec_id").filter(F.col("vec_id") < 10)
    ann = S.cosine_topk_lsh(vecs.drop("norm"), queries, dim=64, k=10)
    exact = S.cosine_topk_bruteforce(vecs.filter(F.col("vec_id") < 10), vecs, k=10)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r.q_vec_id, set()).add(r.n_vec_id)
    got: dict[int, set] = {}
    for r in ann.collect():
        got.setdefault(r.q_vec_id, set()).add(r.n_vec_id)
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = sum(recalls) / len(recalls)
    # 16 tables x 4 planes on 64-dim near-orthogonal random vectors
    # measured 0.86 at defaults; alert well below that
    assert recall >= 0.6, f"recall collapsed: {recall:.2f}"
