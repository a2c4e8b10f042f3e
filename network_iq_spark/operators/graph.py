"""Connected components — transitive closure for dedup clustering.

The dedup family emits PAIRS (MinHash/SimHash/embedding near-dups); keeping
one representative per duplicate *cluster* needs the transitive closure:
a~b and b~c put a,c in one cluster even if (a,c) never collided. The
pipeline's cheap rule (drop the larger id of each pair) over-keeps exactly
when chains are longer than one hop; this operator is the exact version.

Min-label propagation: every vertex starts labeled with itself; each round,
every vertex takes the min label among itself and its neighbors; fixpoint =
every vertex labeled with its component's minimum id. The fixpoint is
ORDER-INDEPENDENT (min is idempotent/commutative/associative), so the
result is deterministic regardless of execution schedule — which is what
lets a DuckDB recursive CTE serve as the oracle.

Iterative-by-nature: rounds = component diameter, each round one join + one
min-aggregate (both shuffles on the vertex key — at scale, pre-partition
both sides on it once). The driver loop holds NO data — only the converged?
boolean crosses to Python; per-round ``localCheckpoint`` truncates lineage
so round N's plan doesn't replay rounds 1..N-1 (the standard Spark
iterative-algorithm idiom — GraphX Pregel does the same internally).
Dedup graphs are near-dup clusters: diameter is small (2-5), so expect
single-digit rounds. For adversarial long-chain graphs, the large-star/
small-star variant halves the diameter per round — same primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id → cluster_id) where cluster_id = min vertex id of the component.

    ``vertices``: one row per vertex (isolated vertices become singleton
    clusters). ``edges``: undirected pairs. Raises after ``max_iter``
    non-converged rounds rather than returning a partial labeling.
    """
    # materialize the symmetrized edges ONCE — edges is often an expensive
    # pipeline (e.g. the MinHash cascade) and every round joins against it;
    # without this the lineage re-executes that pipeline per round
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("u"), F.col(id_col).alias("label")
    ).localCheckpoint()

    for _ in range(max_iter):
        msgs = sym.join(labels, "u").select(F.col("v").alias("u"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("u").alias(id_col), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
