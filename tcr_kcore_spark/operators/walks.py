"""Deterministic random-walk sampling — the embedding-training corpus
generator (DeepWalk / node2vec with p = q = 1: unbiased walks).

A 100 TB training pipeline samples walk corpora from the link graph to
train node/file embeddings; this is the graph-side op that feeds the
similarity/ANN stack (functions/similarity.py).  The walk is FULLY
deterministic — the step choice is ``md5(walk_id:step:seed)`` reduced mod
the current vertex's out-degree — so runs are reproducible, resumable,
and cross-engine checkable (md5 is computable in DuckDB too; the driver
entry hash-checks the ENTIRE walk corpus against an unrolled SQL oracle,
unlike sampling ops that can only be property-tested).

Spark shape: one neighbor-index build per graph — ``row_number`` over
(src, dst-order) minus 1, i.e. each vertex's neighbors numbered
0..deg-1 — then each step is two hash joins: state ⋈ degree (compute the
choice), state ⋈ index on (vertex, choice) (follow the edge).  State is
lineage-truncated per step (superstep.truncate_lineage).  The index
window partitions by src, so one task sorts at most max-degree rows per
vertex — acceptable once-per-graph; the per-step joins are plain
key joins with no window.

Walks stop early at sinks (vertices with no out-edges): the inner degree
join drops them — on symmetrized graphs every vertex has out-degree ≥ 1,
so walks always reach full length there.

Reference: TCR-KCore has no sampling op (GPU GAS kernels only); this is
pipeline breadth the task sheet's training-data mandate adds on top of
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.superstep import SuperstepStats, truncate_lineage


def _choice(walk_id_col, step: int, seed: int):
    """Deterministic 32-bit choice value: first 8 hex chars of
    md5("<walk_id>:<step>:<seed>") as an integer — bit-identical in
    DuckDB via CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)."""
    s = F.concat_ws(":", walk_id_col, F.lit(step), F.lit(seed))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def random_walks(
    graph: LinkGraph,
    length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> tuple[DataFrame, SuperstepStats]:
    """(walk_id, step, vertex) for ``walks_per_vertex`` walks of
    ``length`` steps from EVERY vertex; walk_id = vertex_id *
    walks_per_vertex + replica.  Deterministic in (graph, seed)."""
    stats = SuperstepStats()
    edges = graph.edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    idx = edges.withColumn("i", F.row_number().over(w) - 1).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).persist()

    W = int(walks_per_vertex)
    state = graph.vertices().select(
        F.explode(
            F.array(*[(F.col("id") * W + r).cast("long") for r in range(W)])
        ).alias("walk_id"),
        F.col("id").alias("cur"),
    )
    out = [state.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))]
    for step in range(1, int(length) + 1):
        chosen = (
            state.join(deg, state.cur == deg.src)
            .select(
                "walk_id", "cur", F.pmod(_choice(F.col("walk_id"), step, seed), F.col("d")).alias("i")
            )
        )
        state = (
            chosen.join(idx, [chosen.cur == idx.src, chosen.i == idx.i])
            .select("walk_id", F.col("dst").alias("cur"))
        )
        state = truncate_lineage(state)
        stats.supersteps += 1
        out.append(
            state.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("vertex"))
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res, stats


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, cnt): skip-gram training pairs from a walk corpus
    — every ordered (vertex_at_step_i, vertex_at_step_j) pair within the
    same walk at 0 < |i − j| ≤ ``window``, with multiplicity (the
    word2vec/DeepWalk co-occurrence table a trainer consumes).  One
    self-join on walk_id bounded by the step-distance predicate (walks
    are length-L rows, so the join fan-out per walk is ≤ L·2w — never a
    cross join), then a map-side-combinable count."""
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("si"), F.col("vertex").alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("sj"), F.col("vertex").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("si") != F.col("sj"))
            & (F.abs(F.col("si") - F.col("sj")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
