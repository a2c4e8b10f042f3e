"""Connected components: exact transitive closure, deterministic fixpoint."""

from __future__ import annotations

from network_iq_spark.operators.graph import connected_components


def test_chain_transitivity_and_singletons(spark):
    """A 4-chain collapses to one cluster (the case the drop-larger-of-pair
    rule gets wrong); isolated vertices keep their own id."""
    verts = spark.createDataFrame([(i,) for i in range(1, 9)], "id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "src bigint, dst bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6, 8: 8}


def test_label_is_component_min_not_edge_order(spark):
    """Edges listed high-to-low still converge to the component minimum."""
    verts = spark.createDataFrame([(i,) for i in (10, 20, 30, 40)], "id bigint")
    edges = spark.createDataFrame(
        [(40, 30), (30, 20), (20, 10)], "src bigint, dst bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(verts, edges).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10}


def test_two_dense_components(spark):
    verts = spark.createDataFrame([(i,) for i in range(6)], "id bigint")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], "src bigint, dst bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(verts, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
