"""HITS (D12) and Louvain phase 1 (D14) vs their NumPy oracles."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators import hits, louvain_phase1

from tests import oracles
from tests.conftest import edges_df


DIRECTED = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 3), (4, 0), (5, 4),
]


def test_hits_matches_numpy_oracle(spark):
    g = LinkGraph(edges_df(spark, DIRECTED), directed=True)
    got, stats = hits(g, max_iter=30, tol=1e-9)
    exp = oracles.hits(DIRECTED, max_iter=30, tol=1e-9)
    rows = {r["id"]: (r["hub"], r["auth"]) for r in got.collect()}
    assert set(rows) == set(exp)
    for v, (h, a) in exp.items():
        assert rows[v][0] == pytest.approx(h, abs=1e-9), ("hub", v)
        assert rows[v][1] == pytest.approx(a, abs=1e-9), ("auth", v)


def test_hits_early_convergence(spark):
    # a DAG star: hubs/auths converge in one step; the tol early-out fires
    edges = [(0, i) for i in range(1, 6)]
    g = LinkGraph(edges_df(spark, edges), directed=True)
    got, stats = hits(g, max_iter=50, tol=1e-4)
    assert stats.converged and stats.supersteps < 50
    rows = {r["id"]: (r["hub"], r["auth"]) for r in got.collect()}
    assert rows[0][0] == pytest.approx(1.0, abs=1e-12)  # only hub
    for i in range(1, 6):
        assert rows[i][1] == pytest.approx(1 / 5**0.5, abs=1e-12)


# two triangles joined by one bridge edge: phase 1 should pull each
# triangle into one community
TWO_TRIANGLES = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


# the reference's absolute 0.012 gate means gains (which scale ~1/m) only
# clear it on small graphs; the lower-threshold cases exercise real move
# cascades on the random fixtures
@pytest.mark.parametrize(
    "edges,rounds,thr",
    [
        (TWO_TRIANGLES, 4, 0.012),
        (oracles.er_graph(n=60, avg_deg=6, seed=7), 3, 0.0005),
        (oracles.zipf_hub_graph(n=80, m=400, seed=3), 3, 0.0005),
    ],
)
def test_louvain_matches_numpy_oracle(spark, edges, rounds, thr):
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got, _ = louvain_phase1(g, max_rounds=rounds, gain_threshold=thr)
    exp = oracles.louvain_phase1(edges, max_rounds=rounds, gain_threshold=thr)
    rows = {r["id"]: r["community"] for r in got.collect()}
    assert rows == exp
    if thr < 0.012:
        assert len(set(rows.values())) < len(rows), "expected real moves"


def test_louvain_improves_modularity(spark):
    edges = TWO_TRIANGLES + [(10, 11), (11, 12), (12, 10), (5, 10)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got, stats = louvain_phase1(g, max_rounds=6)
    rows = {r["id"]: r["community"] for r in got.collect()}
    singletons = {v: v for v in rows}
    assert oracles.modularity(edges, rows) > oracles.modularity(edges, singletons)
    assert len(set(rows.values())) < len(rows)


def test_louvain_aggregate_matches_reference_semantics(spark):
    """Phase 2 (community_aggregation, Louvain.py:130-168): relabel by
    community, canonicalize to (min, max) keeping intra-community
    self-pairs, sum weights over the symmetric table."""
    from tcr_kcore_spark.operators import louvain_aggregate

    g = LinkGraph.from_edges(edges_df(spark, TWO_TRIANGLES), directed=False)
    comm = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)], "id long, community long"
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in louvain_aggregate(g, comm).collect()}
    # NumPy-free replica of the reference loop over the symmetric table
    sym = {(s, d) for s, d in TWO_TRIANGLES} | {(d, s) for s, d in TWO_TRIANGLES}
    cm = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    want: dict = {}
    for s, d in sym:
        key = tuple(sorted((cm[s], cm[d])))
        want[key] = want.get(key, 0.0) + 1.0
    assert got == want
    # intra-triangle weight: 6 symmetric entries each -> (0,0)=6, (3,3)=6,
    # one bridge edge in both directions -> (0,3)=2
    assert got[(0, 0)] == 6.0 and got[(3, 3)] == 6.0 and got[(0, 3)] == 2.0


@pytest.mark.parametrize(
    "edges,thr",
    [
        # 4 triangles + weak bridges: level 1 collapses triangles, level 2
        # merges along condensed bridges
        (
            [(3 * b + i, 3 * b + (i + 1) % 3) for b in range(4) for i in range(3)]
            + [(2, 3), (5, 6), (8, 9)],
            1e-9,
        ),
        (oracles.er_graph(n=60, avg_deg=6, seed=7), 0.0005),
        (oracles.zipf_hub_graph(n=80, m=400, seed=3), 0.0005),
    ],
)
def test_louvain_full_matches_numpy_oracle(spark, edges, thr):
    """Packaged multi-level louvain() (Louvain.py:171+) == the NumPy
    replica of the identical synchronous level loop, original ids."""
    from tcr_kcore_spark.operators import louvain

    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got, stats = louvain(g, max_levels=5, max_rounds=4, gain_threshold=thr)
    exp = oracles.louvain_full(edges, max_levels=5, max_rounds=4, gain_threshold=thr)
    rows = {r["id"]: r["community"] for r in got.collect()}
    assert rows == exp
    assert len(stats) >= 1


def test_louvain_full_runs_multiple_levels(spark):
    """The bridged-triangles graph needs a second level to merge condensed
    communities — asserts the loop actually iterates."""
    from tcr_kcore_spark.operators import louvain

    tris = [(3 * b + i, 3 * b + (i + 1) % 3) for b in range(4) for i in range(3)]
    bridges = [(2, 3), (5, 6), (8, 9)]
    g = LinkGraph.from_edges(edges_df(spark, tris + bridges), directed=False)
    got, stats = louvain(g, max_levels=5, max_rounds=4, gain_threshold=1e-9)
    assert len(stats) >= 2, "expected at least two Louvain levels"
    n_final = got.select("community").distinct().count()
    lvl1, _ = louvain_phase1(g, max_rounds=4, gain_threshold=1e-9)
    n_lvl1 = lvl1.select("community").distinct().count()
    assert n_final <= n_lvl1
    # still a valid assignment over the original vertex set
    assert got.count() == 12


def test_louvain_two_level(spark):
    """phase1 -> aggregate -> phase1 on the condensed graph composes into
    a coarser assignment (the full Louvain loop, Louvain.py:171+)."""
    from tcr_kcore_spark.operators import louvain_aggregate

    # two triangle-pairs, weak bridges: level 1 finds 4 triangles, level 2
    # can merge along the condensed bridges
    tris = []
    for b in range(4):
        o = 3 * b
        tris += [(o, o + 1), (o + 1, o + 2), (o + 2, o)]
    bridges = [(2, 3), (5, 6), (8, 9)]
    g = LinkGraph.from_edges(edges_df(spark, tris + bridges), directed=False)
    lvl1, _ = louvain_phase1(g, max_rounds=4)
    n1 = lvl1.select("community").distinct().count()
    assert n1 < 12
    condensed = louvain_aggregate(g, lvl1)
    # next-level input: symmetric closure of the canonical pairs, KEEPING
    # the (c,c) self-weights (from_edges would drop them)
    from pyspark.sql import functions as F

    rev = condensed.where("src != dst").select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    g2 = LinkGraph(condensed.unionByName(rev), directed=False)
    lvl2, _ = louvain_phase1(g2, max_rounds=4, gain_threshold=1e-9)
    assert lvl2.count() == n1


# random ER graph (seed 167 of the search in r5) on which the operator
# breaks at level 2 AND the pre-fix oracle (self-pairs NOT doubled on
# identity levels) returns a DIFFERENT community assignment — i.e. the
# phantom levels 3-4 actually cross a gain decision boundary here
_EARLY_BREAK_EDGES = [
    (0, 1), (0, 2), (0, 5), (0, 7), (0, 8), (1, 4), (1, 6), (1, 7),
    (2, 3), (2, 6), (2, 8), (3, 4), (3, 6), (3, 8), (4, 5), (4, 6),
    (4, 7), (5, 6), (5, 8),
]


def test_louvain_full_sql_early_break(spark):
    """r4 ADVICE item #1: the 4-level unrolled SQL oracle must match the
    operator even when the operator early-breaks at level >= 2, leaving the
    SQL to run phantom levels over a condensed graph that carries (c, c)
    self-pairs.  The fixed oracle doubles self-pair weights on identity
    levels (uniform exact x2 scaling -> bit-equal gains -> no phantom
    moves); the pre-fix oracle mismatches on this graph."""
    import duckdb

    import __spark_entry__ as entry
    from tcr_kcore_spark.operators import louvain

    g = LinkGraph.from_edges(edges_df(spark, _EARLY_BREAK_EDGES), directed=False)
    got, stats = louvain(g, max_levels=4, max_rounds=2, gain_threshold=1e-9)
    rows = {r["id"]: r["community"] for r in got.collect()}
    # precondition: the unsound path is actually exercised — a real move
    # level followed by a break strictly before the SQL's 4 levels
    assert 2 <= len(stats) < 4, "graph no longer early-breaks; pick another"
    sym = sorted(
        {(a, b) for a, b in _EARLY_BREAK_EDGES}
        | {(b, a) for a, b in _EARLY_BREAK_EDGES}
    )
    vals = ", ".join(f"({a}, {b})" for a, b in sym)
    cte = (
        "edges AS MATERIALIZED (SELECT CAST(src AS BIGINT) AS src, "
        f"CAST(dst AS BIGINT) AS dst FROM (VALUES {vals}) AS t(src, dst))"
    )
    sql = entry._louvain_full_sql(4, 2, 1e-9, edges_cte=cte)
    oracle = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert rows == oracle
