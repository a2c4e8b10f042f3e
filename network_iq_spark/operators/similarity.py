"""Similarity search over embedding columns (SURVEY.md §7 F).

``embeddings.embedding`` is ``array<float>`` — the first-class multimodal
column type. Two paths:

- **Brute-force cosine top-k** (the correctness baseline): cross join the
  query set against the corpus, dot products via ``aggregate``/``zip_with``
  (JVM-side, codegen — no Python). Cost O(|Q|·N): right answer whenever the
  query set is small or as the in-bucket scorer below.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (seeded, deterministic) → candidates share a signature prefix bucket →
  brute-force only inside buckets. At 100 TB the corpus shuffles once on
  bucket id; queries broadcast.

Element values are cast to double BEFORE accumulation — float accumulation
would diverge between engines and lose precision at high dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: str) -> Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def _dot(a: str, b: str) -> Column:
    """Sequential-order double dot product (bit-stable across engines)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def with_norm(df: DataFrame, vec: str = "v", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(vec, vec)))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Exact cosine top-k: queries × corpus → cos → row_number ≤ k.

    Both sides must carry (id_col, vec_col[array<double>], norm). Output:
    (q_vec_id, n_vec_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_vec_id"),
        F.col(vec_col).alias("cv"),
        F.col("norm").alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "n_vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), F.col("n_vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "n_vec_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: values in [-1, 1)
    from a splitmix-style integer hash — no RNG state, reproducible on any
    engine/cluster."""
    vals = []
    for i in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9 + i * 0x94D049BB133111EB) % (
            2**64
        )
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) % (2**64)
        x ^= x >> 27
        vals.append((x % (2**32)) / (2**31) - 1.0)
    return vals


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Random-hyperplane signature: bit_p = (v · h_p) > 0, bucket = Σ bit·2^p.
    Map-only; the bucket id is the ANN shuffle/join key."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = _hyperplane(dim, seed, p)
        # inject the literal hyperplane as a temp column the lambda can see
        df = df.withColumn(f"__h{p}__", F.array(*[F.lit(x) for x in plane]))
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, __h{p}__, (x, y) -> x * y), "
            f"cast(0.0 as double), (acc, x) -> acc + x)"
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**p)).otherwise(F.lit(0)).cast("bigint")
    out = df.withColumn("bucket", bucket)
    return out.drop(*[f"__h{p}__" for p in range(n_planes)])


def cosine_topk_lsh(
    df: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """ANN top-k: brute force restricted to same-LSH-bucket candidates.

    Recall < 1 by construction (multi-probe/multi-table raise it); exists as
    the documented scale path next to the exact baseline.
    """
    sig = lsh_signatures(df, dim, n_planes, id_col=id_col, vec_col=vec_col)
    sig = with_norm(sig, vec_col)
    q = sig.join(query_ids, id_col, "left_semi").select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
        "bucket",
    )
    c = sig.select(
        F.col(id_col).alias("n_vec_id"),
        F.col(vec_col).alias("cv"),
        F.col("norm").alias("cn"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "n_vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), F.col("n_vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "n_vec_id", F.col("rank").cast("int").alias("rank"), "cos")
    )
