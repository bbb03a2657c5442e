"""Synchronous label propagation — reference D11
(``TCR/src/demo/LabelPropagation.py:17-106``).

Semantics: label₀ = own id; each round every vertex adopts the most frequent
label among its neighbors.  The reference breaks frequency ties randomly
(``LabelPropagation.py:33-41``); we use a deterministic tie-break — smallest
label wins — and document the deviation (SURVEY.md §7 "LPA determinism").
Default round count mirrors the reference CLI default (``maxsteps``).

Spark formulation (reference B12): ``msgs.groupBy(id, label).count()`` then
a second hash aggregation ``max(struct(cnt, -label))`` per vertex — the
mode with the deterministic (count desc, label asc) tie-break expressed as
two map-side-combinable aggregations, no window.  Both levels absorb
in-degree hubs through Tungsten partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.plans.partitioning import (
    broadcast_max_rows,
    plan_superstep_edges,
    state_side,
)
from tcr_kcore_spark.superstep import SuperstepStats, propagate_release, run_supersteps


def lpa_round(edges: DataFrame, labels: DataFrame, bcast: bool = True) -> DataFrame:
    """One synchronous LPA round over symmetrized ``edges``;
    ``labels`` = (id, label)."""
    lab = labels.select(F.col("id").alias("src"), F.col("label").alias("nbr_label"))
    lab = state_side(lab, bcast)
    msgs = edges.join(
        lab,
        "src",
    ).select(F.col("dst").alias("id"), F.col("nbr_label").alias("label"))
    counts = msgs.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
    # mode with deterministic tie-break (count desc, label asc) as ONE hash
    # aggregation: max of struct(cnt, -label) — map-side combinable, so a
    # hub's label votes partially aggregate on the map side instead of
    # funneling its whole distinct-label set through one window partition
    best = (
        counts.groupBy("id")
        .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"))
        .select("id", (-F.col("m.neg")).alias("new_label"))
    )
    # vertices with no neighbors keep their label
    if bcast:
        best = F.broadcast(best)
    return labels.join(best, "id", "left").select(
        "id", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
    )


def label_propagation(
    graph: LinkGraph,
    rounds: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, SuperstepStats]:
    """Returns ((id, label), stats) after a fixed number of synchronous
    rounds (the reference runs a fixed ``maxsteps``, default 3 from CLI /
    50 in-code — ``LabelPropagation.py:18,79``)."""
    g = graph.undirected_view()
    # one distinct scan for the vertex set (persisted: bcast decision +
    # init); edge cache materializes inside round 1 (no eager count)
    verts = g.vertices().persist()
    bcast = verts.count() <= broadcast_max_rows()
    edges = plan_superstep_edges(g.edges.select("src", "dst"), bcast).persist()
    init = verts.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, i: int) -> DataFrame:
        return lpa_round(edges, state, bcast)

    state, stats = run_supersteps(
        init,
        step,
        converged=None,
        max_iter=rounds,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        name="lpa",
        resume=resume,
        truncate_init=False,  # init projects the persisted vertex set
    )
    edges.unpersist()
    verts.unpersist()
    return propagate_release(state.select("id", "label"), state), stats
