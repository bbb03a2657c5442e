"""BFS — reference D8 (``TCR/src/demo/BFS.py:16-132``).

Reference semantics: pull-based min-distance, init ``inf`` except source=0,
``d'_v = min(d_v, min_{u∈in(v)} d_u + 1)``; terminates when no distance
changes.  The Spark formulation is the classic frontier BFS: the frontier is
the set of vertices first reached last superstep; each superstep is one
(broadcastable) semi-join expansion — distance = superstep index.  Output is
identical to the reference's fixpoint.

Unreachable vertices: distance NULL (the reference leaves them at inf and
its writer prints inf; NULL is our typed equivalent — documented deviation).
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
from tcr_kcore_spark.superstep import (
    ObservedConvergence,
    SuperstepStats,
    propagate_release,
    run_supersteps,
)


def bfs(
    graph: LinkGraph,
    source: int,
    max_iter: int = 200,
    directed: bool | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, SuperstepStats]:
    """Returns ((id, distance), stats).  ``directed=None`` follows the
    graph's own directedness (the reference BFS gathers over in-edges of a
    directed CSC, i.e. traverses directed edges forward)."""
    g = graph if (directed is None or directed == graph.directed) else (
        graph.undirected_view() if not directed else graph
    )
    # one distinct scan for the vertex set (persisted: bcast decision +
    # init); edge cache materializes inside superstep 1 (no eager count)
    verts = g.vertices().persist()
    bcast = verts.count() <= broadcast_max_rows()
    edges = plan_superstep_edges(g.edges.select("src", "dst"), bcast).persist()

    # state: (id, dist, frontier) — frontier = reached exactly last step
    init = verts.select(
        "id",
        F.when(F.col("id") == source, F.lit(0)).cast("long").alias("dist"),
        (F.col("id") == source).alias("frontier"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.where("frontier").select(F.col("id").alias("src"))
        frontier = state_side(frontier, bcast)
        reached = (
            edges.join(frontier, "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        out = (
            state.join(F.broadcast(reached) if bcast else reached, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("dist"),
                    F.when(F.col("hit"), F.lit(i + 1).cast("long")),
                ).alias("new_dist"),
                "dist",
            )
            .select(
                "id",
                F.col("new_dist").alias("dist"),
                (F.col("new_dist").isNotNull() & F.col("dist").isNull()).alias("frontier"),
            )
        )
        # frontier size collected during the materialization job (r6)
        return oc.attach(out, F.sum(F.col("frontier").cast("long")).alias("n"))

    oc = ObservedConvergence()

    def converged(prev: DataFrame, new: DataFrame, i: int) -> bool:
        row = oc.take()
        if row is not None:
            return (row["n"] or 0) == 0
        return new.where("frontier").limit(1).count() == 0

    state, stats = run_supersteps(
        init,
        step,
        converged,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        name="bfs",
        resume=resume,
        truncate_init=False,  # init projects the persisted vertex set
    )
    out = propagate_release(state.select("id", F.col("dist").alias("distance")), state)
    edges.unpersist()
    verts.unpersist()
    return out, stats
