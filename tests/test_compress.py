"""Factored-graph representation (reference A5/D15 counterpart): shared
out-neighbor sets route through virtual set-nodes and PageRank over the
factored tables equals the plain operator exactly."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.compress import compress_graph, pagerank_factored
from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators.pagerank import pagerank_fixed_iters
from tcr_kcore_spark.superstep import release_state

from tests import oracles
from tests.conftest import edges_df


def _shared_set_graph(spark):
    """20 'importer' vertices all referencing the same 5-element hub set,
    plus a handful of unique-adjacency vertices and a big-degree vertex."""
    edges = []
    hub_set = [100, 101, 102, 103, 104]
    for v in range(20):
        for t in hub_set:
            edges.append((v, t))
    edges += [(50, 51), (51, 52), (52, 50), (100, 50), (101, 52)]
    # a vertex above max_set_size stays direct
    edges += [(60, 200 + i) for i in range(40)]
    return edges_df(spark, edges)


def test_factoring_compresses_shared_sets(spark):
    g = LinkGraph.from_edges(_shared_set_graph(spark), directed=True)
    cg = compress_graph(g, max_set_size=16)
    # 20 hub-set owners + the two coincidental singleton-set pairs
    # ({50}: vertices 52 & 100; {52}: vertices 51 & 101) = 24 owners over
    # 7 member rows, replacing 110 of the 145 edges
    assert cg.owners.count() == 24
    assert cg.members.count() == 7
    assert cg.n_rows < cg.n_edges
    assert cg.ratio < 0.6
    # the 40-degree vertex exceeded max_set_size -> all direct
    assert cg.direct.where("src = 60").count() == 40
    cg.unpersist()


def test_pagerank_factored_bundle_shape(spark):
    """The bench_factored.py win-case shape at unit scale: files import
    exactly their bundle (identical out-sets factor wholesale), libraries
    carry a unique chain edge (stays direct).  Pins the reworked loop
    (pre-weighted, pre-partitioned caches) in both broadcast regimes."""
    import os

    n_files, s_libs, l_bundles = 60, 4, 3
    edges = []
    for f in range(n_files):
        b = f % l_bundles
        edges += [(f, n_files + b * s_libs + j) for j in range(s_libs)]
    n_libs = l_bundles * s_libs
    edges += [
        (n_files + i, n_files + (i + 1) % n_libs) for i in range(n_libs)
    ]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=True)
    for force_shuffle in (False, True):
        if force_shuffle:
            os.environ["SPARK_GRAFT_BROADCAST_MAX_ROWS"] = "0"
        try:
            cg = compress_graph(g, max_set_size=16)
            assert cg.owners.count() == n_files
            assert cg.members.count() == n_libs
            assert round(cg.ratio, 3) == round(
                (n_files + 2 * n_libs) / ((n_files + l_bundles) * s_libs), 3
            )
            plain = pagerank_fixed_iters(g, 6)
            fact, _ = pagerank_factored(cg, 6)
            diff = (
                plain.withColumnRenamed("rank", "r1")
                .join(fact.withColumnRenamed("rank", "r2"), "id")
                .agg(F.max(F.abs(F.col("r1") - F.col("r2"))))
                .first()[0]
            )
            assert diff < 1e-9, (force_shuffle, diff)
            release_state(plain)
            release_state(fact)
            cg.unpersist()
        finally:
            os.environ.pop("SPARK_GRAFT_BROADCAST_MAX_ROWS", None)


def test_pagerank_factored_equals_plain(spark):
    for builder in (
        _shared_set_graph,
        lambda s: edges_df(s, oracles.er_graph(n=120, avg_deg=5, seed=3)),
    ):
        g = LinkGraph.from_edges(builder(spark), directed=True)
        cg = compress_graph(g, max_set_size=16)
        plain = pagerank_fixed_iters(g, 6)
        fact, _ = pagerank_factored(cg, 6)
        joined = plain.withColumnRenamed("rank", "r1").join(
            fact.withColumnRenamed("rank", "r2"), "id", "full"
        )
        assert joined.where("r1 IS NULL OR r2 IS NULL").count() == 0
        diff = joined.agg(F.max(F.abs(F.col("r1") - F.col("r2")))).first()[0]
        assert diff < 1e-9, diff
        release_state(plain)
        release_state(fact)
        cg.unpersist()
