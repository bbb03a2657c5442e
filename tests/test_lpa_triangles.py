from __future__ import annotations

import pytest

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators import (
    label_propagation,
    local_clustering_coefficient,
    triangle_count,
)
from tcr_kcore_spark.operators.triangles import triangles_per_vertex
from tests import oracles
from tests.conftest import edges_df


def test_lpa_two_cliques_bridge(spark):
    # two 4-cliques joined by one edge: labels converge per clique
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = c1 + c2 + [(3, 4)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, _ = label_propagation(g, rounds=5)
    got = {r["id"]: r["label"] for r in result.collect()}
    want = oracles.lpa(edges, rounds=5)
    assert got == want


def test_lpa_er_matches_oracle(spark):
    edges = oracles.er_graph(n=200, avg_deg=5, seed=13)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    for rounds in (1, 3):
        result, _ = label_propagation(g, rounds=rounds)
        got = {r["id"]: r["label"] for r in result.collect()}
        want = oracles.lpa(edges, rounds=rounds)
        assert got == want, rounds


def test_triangle_tail_counts(spark):
    # FIXTURES F3.1: per-vertex [1,1,1,0]
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got = {r["id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}
    assert triangle_count(g).first()["total_triangles"] == 1


def test_triangles_er_vs_oracle(spark):
    edges = oracles.er_graph(n=150, avg_deg=10, seed=21)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got = {r["id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    want = oracles.triangles(edges)
    assert got == want
    total = triangle_count(g).first()["total_triangles"]
    assert total == sum(want.values()) // 3


def test_lcc(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[2] == pytest.approx(2 * 1 / (3 * 2))
    assert got[3] == 0.0
