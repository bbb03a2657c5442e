"""PageRank — reference semantics D1/D2/D3 (SURVEY.md §2.D).

Exact semantics reproduced:

- init ``r = 1`` for every vertex (NOT 1/N) — ``TCR/src/demo/PageRank.py:27``;
- update ``r' = 0.15 + 0.85 · Σ_{u∈in(v)} r_u / outdeg_u`` —
  ``TCR/src/demo/PageRank.py:57``;
- optional dangling mass: ``r' = 0.15 + 0.85 · (Σ ... + Σ_{d: outdeg_d=0} r_d / N)``
  — the SpMV variant ``TCR/src/demo/PageRankMatrix.py:50-61``;
- convergence: ``max_v |r'_v − r_v| ≤ tol`` (reference ``UPDATE_THRESHOLD``,
  ``PageRank.py:29``; we default tol=1e-6 per BASELINE.json).

Spark-first design:

- the per-edge message weight ``damping / outdeg`` is **constant-folded into
  the edge table once** (the reference folds 0.85 into 1/outdeg the same way,
  ``TCR/single/PR.py:30``), so each superstep is exactly one join + one
  aggregation + one outer join:
  ``edges_w ⋈ state on src → groupBy(dst).sum(w·r) → vertices ⟕ msgs``;
- the groupBy(dst) aggregation gets map-side partial aggregation from
  Tungsten automatically, which is what neutralizes in-degree hubs (the
  reference needs Gemini/LPT partitioners for the same skew, SURVEY §2.C);
- sums accumulate in float64 (Spark `double`) so allclose(1e-6) holds even
  though the reference accumulates float32;
- the state is double-buffered + checkpointed by the superstep driver.
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


def pagerank(
    graph: LinkGraph,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    dangling: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    truncate_every: int = 1,
) -> tuple[DataFrame, SuperstepStats]:
    """Returns ((id, rank), stats).  ``dangling=True`` selects the
    PageRankMatrix semantics (D2); ``False`` the plain GAS demo (D1).

    ``truncate_every``: supersteps chained lazily per Spark job (see
    run_supersteps); forced to 1 when ``dangling`` (the per-step dangling
    mass is a driver-side action and must see a materialized state)."""
    if dangling:
        truncate_every = 1
    spark = graph.edges.sparkSession
    verts = graph.vertices().persist()
    n = verts.count()

    # state has one row per vertex: when it fits a broadcast (the usual
    # case below ~10^6-10^7 vertices), the message join is map-side; above
    # the threshold the state shuffle-joins against src-partitioned edges
    # (see plan_superstep_edges — exchange ∝ V per superstep, never ∝ E).
    bcast = n <= broadcast_max_rows()

    out_deg = graph.out_degrees()
    # Constant-fold damping/outdeg into the cached edge table (D3 trick)
    # and hash-partition it ONCE for the whole superstep loop — a converged
    # PageRank run does exactly one edge shuffle total, here at build time.
    edges_w = plan_superstep_edges(
        graph.edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(damping) / F.col("out_deg")).alias("w")),
        bcast,
    ).persist()
    # no eager count: the first superstep materializes the cache en route —
    # one fewer full pre-loop pass over E (guide §1.2: don't compute what
    # you throw away)

    if dangling:
        dangles = verts.join(
            out_deg.select(F.col("id")), "id", "left_anti"
        ).persist()  # vertices with no out-edges

    init = verts.select("id", F.lit(1.0).alias("rank"))

    def step(state: DataFrame, i: int) -> DataFrame:
        # only (src, rank) crosses to the message join — the state's delta
        # column from the previous step stays out of the broadcast
        s = state.select(F.col("id").alias("src"), "rank")
        msgs = (
            edges_w.join(state_side(s, bcast), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("msg"))
        )
        base = F.lit(1.0 - damping)
        if dangling:
            mass_row = (
                state.join(dangles, "id", "left_semi").agg(F.sum("rank")).first()[0]
            )
            mass = (mass_row or 0.0) / n
            # msg already carries the damping factor (folded into edge w);
            # only the dangling mass still needs damping applied
            new_rank = (
                base
                + F.coalesce(F.col("msg"), F.lit(0.0))
                + F.lit(damping * mass)
            )
        else:
            new_rank = base + F.coalesce(F.col("msg"), F.lit(0.0))
        # apply via ONE outer join: the state already has exactly one row
        # per vertex, so joining state ⟕ msgs yields both the new rank and
        # the old rank for the delta — r5 joined verts ⟕ msgs and then
        # state again (two joins + an extra broadcast build per superstep)
        msgs_b = F.broadcast(msgs) if bcast else msgs
        out = state.join(msgs_b, "id", "left").select(
            "id",
            (new_rank).alias("rank"),
            F.abs(new_rank - F.col("rank")).alias("delta"),
        )
        # max|Δ| is collected DURING the materialization job (r6) — the
        # separate per-chain agg action disappears (guide §1.2)
        return oc.attach(out, F.max("delta").alias("d"))

    oc = ObservedConvergence()

    def converged(prev: DataFrame, new: DataFrame, i: int) -> bool:
        row = oc.take()
        d = row["d"] if row is not None else new.agg(F.max("delta")).first()[0]
        return (d or 0.0) <= tol

    state, stats = run_supersteps(
        init,
        step,
        converged,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        name="pagerank",
        resume=resume,
        truncate_every=truncate_every,
        # init is a projection of the persisted vertex set — no truncation job
        truncate_init=False,
    )
    result = propagate_release(state.select("id", "rank"), state)
    edges_w.unpersist()
    verts.unpersist()
    if dangling:
        dangles.unpersist()
    return result, stats


def pagerank_fixed_iters(
    graph: LinkGraph,
    iters: int,
    damping: float = 0.85,
    dangling: bool = False,
    truncate_every: int = 1,
) -> DataFrame:
    """Fixed-iteration PageRank (reference demos run a fixed ``num_iter``,
    e.g. 50 at ``TCR/src/demo/PageRank.py:24``).  Used by the oracle-checked
    query entries where an unrolled-SQL oracle must run the identical number
    of rounds."""
    result, _ = pagerank(
        graph,
        damping=damping,
        tol=-1.0,
        max_iter=iters,
        dangling=dangling,
        truncate_every=truncate_every,
    )
    return result


def personalized_pagerank(
    graph: LinkGraph,
    seeds,
    damping: float = 0.85,
    tol: float = -1.0,
    max_iter: int = 8,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    truncate_every: int = 1,
) -> tuple[DataFrame, SuperstepStats]:
    """Personalized PageRank: ``r' = (1−d)·p + d·Σ_{u∈in(v)} r_u/outdeg_u``
    with the reset distribution ``p`` uniform over ``seeds`` (a DataFrame
    with an ``id`` column, or an iterable of vertex ids) and ``r₀ = p`` —
    the seed-relative relevance vector used for related-item retrieval
    over link graphs.  The reference has no PPR; this reuses the plain
    PageRank plan unchanged (folded damping/outdeg edge weights cached
    and partitioned once, one join + one aggregation + one outer join per
    superstep) — only the base term and the init differ, so every scale
    property of D1/D3 carries over.  ``tol <= 0`` runs exactly
    ``max_iter`` supersteps (the SQL-oracle-pinned mode); ``tol > 0``
    stops at max |Δr| ≤ tol."""
    spark = graph.edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    verts = graph.vertices()
    k = seeds.count()
    if k == 0:
        raise ValueError("personalized_pagerank needs at least one seed")
    verts_p = (
        verts.join(seeds.select("id", F.lit(1.0 / k).alias("p")), "id", "left")
        .select("id", F.coalesce("p", F.lit(0.0)).alias("p"))
        .persist()
    )
    n = verts_p.count()
    bcast = n <= broadcast_max_rows()

    out_deg = graph.out_degrees()
    edges_w = plan_superstep_edges(
        graph.edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(damping) / F.col("out_deg")).alias("w")),
        bcast,
    ).persist()
    # no eager count — first superstep materializes the cache (see pagerank)

    # carry the reset probability in the state so the apply phase is ONE
    # outer join (state ⟕ msgs) instead of verts_p ⟕ msgs ⋈ state
    init = verts_p.select("id", "p", F.col("p").alias("rank"))

    def step(state: DataFrame, i: int) -> DataFrame:
        s = state.select(F.col("id").alias("src"), "rank")
        msgs = (
            edges_w.join(state_side(s, bcast), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("msg"))
        )
        new_rank = F.lit(1.0 - damping) * F.col("p") + F.coalesce(
            F.col("msg"), F.lit(0.0)
        )
        msgs_b = F.broadcast(msgs) if bcast else msgs
        out = state.join(msgs_b, "id", "left").select(
            "id",
            "p",
            new_rank.alias("rank"),
            F.abs(new_rank - F.col("rank")).alias("delta"),
        )
        return oc.attach(out, F.max("delta").alias("d"))

    oc = ObservedConvergence()

    def converged(prev: DataFrame, new: DataFrame, i: int) -> bool:
        row = oc.take()  # clears the pending observation either way
        if tol <= 0:
            return False
        d = row["d"] if row is not None else new.agg(F.max("delta")).first()[0]
        return (d or 0.0) <= tol

    state, stats = run_supersteps(
        init,
        step,
        converged,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        name="ppr",
        resume=resume,
        truncate_every=truncate_every,
        truncate_init=False,  # init projects the persisted verts_p
    )
    result = propagate_release(state.select("id", "rank"), state)
    edges_w.unpersist()
    verts_p.unpersist()
    return result, stats
