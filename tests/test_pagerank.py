from __future__ import annotations

import numpy as np
import pytest

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators import pagerank
from tests import oracles
from tests.conftest import edges_df


def _check(spark, edges, dangling, tol=1e-6):
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=True)
    result, stats = pagerank(g, tol=tol, dangling=dangling, max_iter=200)
    got = {r["id"]: r["rank"] for r in result.collect()}
    want = oracles.pagerank(edges, tol=tol, dangling=dangling)
    assert stats.converged
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-6), (v, got[v], want[v])


def test_pagerank_chain_dangling_flag(spark):
    # FIXTURES F3.5: directed chain 0→1→2, vertex 2 dangling
    edges = [(0, 1), (1, 2)]
    _check(spark, edges, dangling=False)
    _check(spark, edges, dangling=True)


def test_pagerank_er_graph(spark):
    edges = oracles.er_graph(n=200, avg_deg=6)
    _check(spark, edges, dangling=False)


def test_pagerank_er_graph_dangling(spark):
    edges = oracles.er_graph(n=150, avg_deg=5, seed=7)
    _check(spark, edges, dangling=True)


def test_pagerank_zipf_hubs(spark):
    # hub-skewed destinations: exercises the partial-agg path under skew
    edges = oracles.zipf_hub_graph(n=400, m=2000)
    _check(spark, edges, dangling=False)


def test_pagerank_star_hub(spark):
    # FIXTURES F3.3: star — hub rank ≫ leaf ranks
    edges = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(1, 6)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=True)
    result, _ = pagerank(g, tol=1e-8, max_iter=300)
    got = {r["id"]: r["rank"] for r in result.collect()}
    assert got[0] > 2 * got[1]
    want = oracles.pagerank(edges, tol=1e-8)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
