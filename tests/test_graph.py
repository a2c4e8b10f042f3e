"""Connected components: exact transitive closure, deterministic fixpoint."""

from __future__ import annotations

import pytest

from network_iq_spark.operators.graph import (
    connected_components,
    connected_components_two_phase,
)


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


@pytest.mark.parametrize(
    "edge_list,n_verts",
    [
        # adversarial long chain: diameter 100 ≫ any sane round budget for
        # label propagation, trivial for the alternating algorithm
        ([(i, i + 1) for i in range(100)], 101),
        # descending chain + dense triangles + isolated vertices
        ([(40, 30), (30, 20), (20, 10), (0, 1), (1, 2), (0, 2)], None),
    ],
)
def test_two_phase_equals_fixpoint(spark, edge_list, n_verts):
    """Output equality: large-star/small-star labels every vertex with the
    component minimum, exactly like min-label propagation, on both a long
    path and a mixed dense/sparse graph (plus singletons)."""
    ids = (
        list(range(n_verts))
        if n_verts
        else sorted({x for e in edge_list for x in e} | {99})
    )
    verts = spark.createDataFrame([(i,) for i in ids], "id bigint")
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    want = {r.id: r.cluster_id for r in connected_components(
        verts, edges, max_iter=200
    ).collect()}
    got = {r.id: r.cluster_id for r in connected_components_two_phase(
        verts, edges
    ).collect()}
    assert got == want


def test_two_phase_converges_in_log_rounds(spark, monkeypatch):
    """O(log n) convergence on a path graph: 512 vertices (diameter 511 —
    label propagation would need ~511 rounds) must converge well within 20
    alternating rounds; the max_iter budget IS the assertion."""
    n = 512
    verts = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = connected_components_two_phase(verts, edges, max_iter=20).collect()
    assert {r.cluster_id for r in got} == {0}
    assert len(got) == n


def test_two_phase_empty_edges_all_singletons(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "id bigint")
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    got = {r.id: r.cluster_id for r in connected_components_two_phase(
        verts, edges
    ).collect()}
    assert got == {i: i for i in range(5)}
