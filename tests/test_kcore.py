from __future__ import annotations

import pytest

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators import kcore, kcore_hindex_rounds
from tests import oracles
from tests.conftest import edges_df


@pytest.mark.parametrize("mode", ["hindex", "peel"])
def test_triangle_tail(spark, mode):
    # FIXTURES F3.1: coreness [2,2,2,1]
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, stats = kcore(g, mode=mode)
    got = {r["id"]: r["coreness"] for r in result.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1}


@pytest.mark.parametrize("mode", ["hindex", "peel"])
def test_star(spark, mode):
    edges = [(0, i) for i in range(1, 6)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, _ = kcore(g, mode=mode)
    got = {r["id"]: r["coreness"] for r in result.collect()}
    assert got == {v: 1 for v in range(6)}


@pytest.mark.parametrize(
    "mode,lfv", [("hindex", 0), ("peel", 0), ("peel", 100_000)]
)
def test_er_graph_vs_bz_oracle(spark, mode, lfv):
    # lfv=0 forces the pure distributed peel rounds; lfv=100k routes through
    # the phase-2 single-task BZ finisher — both must match the oracle
    edges = oracles.er_graph(n=250, avg_deg=8)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, _ = kcore(g, mode=mode, local_finish_vertices=lfv)
    got = {r["id"]: r["coreness"] for r in result.collect()}
    want = oracles.coreness(edges)
    assert got == want


def test_peel_midway_edge_mass_handoff(spark):
    """Round-4 trigger: sum(deg) in the bounds action fires the BZ finisher
    MID-peel (k_floor > 0) once the residual edge mass drops under the cap
    — several distributed rounds first, then the single-task finish, and
    the composed result must still equal the oracle exactly."""
    edges = oracles.er_graph(n=250, avg_deg=8)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, stats = kcore(
        g, mode="peel", local_finish_vertices=10_000, local_finish_edges=800
    )
    got = {r["id"]: r["coreness"] for r in result.collect()}
    assert got == oracles.coreness(edges)
    # the handoff really was midway: distributed rounds ran AND the
    # finisher fired
    assert stats.supersteps >= 1 and stats.local_finish_secs > 0


@pytest.mark.parametrize("mode", ["hindex", "peel"])
def test_zipf_hubs(spark, mode):
    edges = oracles.zipf_hub_graph(n=500, m=2500)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    result, _ = kcore(g, mode=mode)
    got = {r["id"]: r["coreness"] for r in result.collect()}
    want = oracles.coreness(edges)
    assert got == want


def test_hindex_fixed_rounds_matches_oracle(spark):
    edges = oracles.er_graph(n=150, avg_deg=6, seed=9)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    for rounds in (1, 3):
        result = kcore_hindex_rounds(g, rounds)
        got = {r["id"]: r["coreness"] for r in result.collect()}
        want = oracles.hindex_rounds(edges, rounds)
        assert got == want, rounds


def test_peel_path_graph_output_folds_logarithmic(spark):
    """A path graph peels ~V/2 rounds; the peeled-output accumulator must
    fold on a doubling cadence — O(log rounds) consolidation jobs, not one
    write per round (VERDICT r1 finding #4)."""
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import kcore
    from tests.conftest import edges_df

    n = 120
    path = [(i, i + 1) for i in range(n - 1)]
    g = LinkGraph.from_edges(edges_df(spark, path), directed=False)
    out, stats = kcore(g, mode="peel", local_finish_vertices=0)
    rows = {r["id"]: r["coreness"] for r in out.collect()}
    assert rows == {i: 1 for i in range(n)}
    assert stats.supersteps >= n // 2 - 2
    import math

    assert stats.checkpoints <= math.ceil(math.log2(stats.supersteps)) + 2, (
        stats.checkpoints,
        stats.supersteps,
    )


def test_peel_round_driver_action_budget(spark):
    """Each peel round issues TWO Python-level driver actions — the peel
    count and ONE combined count+min aggregation (VERDICT r2 ask #6 merged
    the former separate min(deg) and count() actions).  Counted by
    wrapping DataFrame.count/first/collect; raw Spark job ids cannot
    discriminate this because AQE splits one action into several jobs
    (broadcast/shuffle query stages)."""
    from pyspark.sql import DataFrame

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import kcore
    from tests.conftest import edges_df

    n = 80
    path = [(i, i + 1) for i in range(n - 1)]
    g = LinkGraph.from_edges(edges_df(spark, path), directed=False)
    g.materialize()
    calls = {"n": 0}
    orig = {m: getattr(DataFrame, m) for m in ("count", "first", "collect")}

    def wrap(name):
        def inner(self, *a, **k):
            calls["n"] += 1
            return orig[name](self, *a, **k)

        return inner

    for m in orig:
        setattr(DataFrame, m, wrap(m))
    try:
        out, stats = kcore(g, mode="peel", local_finish_vertices=0)
    finally:
        for m, fn in orig.items():
            setattr(DataFrame, m, fn)
    rounds = stats.supersteps
    assert rounds >= n // 2 - 2
    # 2 actions/round + setup/fold slack; the unmerged shape needs
    # 3/round and must fail this bound
    budget = 2 * rounds + 20
    assert calls["n"] <= budget, (calls["n"], rounds, budget)
    rows = {r["id"]: r["coreness"] for r in out.collect()}
    assert rows == {i: 1 for i in range(n)}
    g.unpersist()


def test_peel_checkpoint_resume_identical(spark, tmp_path):
    """Peel-mode phase checkpoint (reference deleted-bitmap semantics,
    KCore_big.py:252-259): interrupt mid-peel, resume from the survivor
    degrees + coreness-so-far, final coreness identical."""
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import kcore
    from tests import oracles
    from tests.conftest import edges_df

    edges = oracles.er_graph(n=250, avg_deg=6, seed=5)
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    full, _ = kcore(g, mode="peel", local_finish_vertices=0)
    want = {r["id"]: r["coreness"] for r in full.collect()}

    ck = str(tmp_path / "peel_ck")
    g2 = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    partial, st1 = kcore(
        g2, mode="peel", max_iter=4, checkpoint_dir=ck, checkpoint_every=2,
        local_finish_vertices=0,
    )
    assert st1.supersteps == 4

    # resume WITH the local finisher on: it must seed k from the manifest
    # and complete to the identical coreness
    g3 = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    resumed, st2 = kcore(
        g3, mode="peel", checkpoint_dir=ck, checkpoint_every=2, resume=True
    )
    assert st2.resumed_from is not None and st2.resumed_from >= 2
    got = {r["id"]: r["coreness"] for r in resumed.collect()}
    assert got == want
