"""Triangle counting + local clustering coefficient — reference D7/D13.

Reference semantics (``TCR/src/demo/TriangleCounting.py:25-80``): per-vertex
triangle count on the undirected graph via A²∘A (dense adjacency on GPU);
global count = Σ/3.  LCC (``LocalClusteringCoeffcient.py:19-112``):
``C_v = 2·tri(v) / (deg_v · (deg_v − 1))``, NaN→0.

Spark formulation — the canonical distributed TC, never a dense matrix:

1. orient each undirected edge from the lower-(degree, id) endpoint to the
   higher one — every triangle becomes exactly ONE wedge + one closing edge,
   and the wedge join's fan-out is bounded by the *oriented* out-degree
   (≤ O(√E) per vertex), which is the skew control that makes this survive
   hub vertices at 100 TB;
2. wedge join: both edges of a triangle's wedge leave its minimum vertex,
   so wedges are ``O ⋈ O on o1.src = o2.src`` with ``o1.dst < o2.dst``;
3. close the wedge against the oriented edge set: ``(o1.dst, o2.dst) ∈ O``;
4. each triangle found once → credit all three corners for per-vertex
   counts; global = count of closed wedges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import LinkGraph


def _oriented(g: LinkGraph) -> DataFrame:
    """Orient the symmetrized edge set by (degree, id): keep (u,v) iff
    (deg(u), u) < (deg(v), v).  Exactly one direction survives per
    undirected edge.  The destination's (degree, id) key is kept as ``dd``
    so wedges can order their legs by the SAME total order."""
    und = g.undirected_view()
    deg = und.out_degrees().select(
        F.col("id"), F.col("out_deg").alias("d")
    )
    e = (
        und.edges.select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")), "dst")
        .where(
            (F.col("sd") < F.col("dd"))
            | ((F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "dd")
    )
    return e


def triangles_per_vertex(g: LinkGraph) -> DataFrame:
    """(id, triangles) — vertices in no triangle get 0.

    Returns a MATERIALIZED (lineage-truncated) frame; callers that want the
    cached blocks back call ``superstep.release_state`` on the result."""
    from tcr_kcore_spark.superstep import truncate_lineage

    o = _oriented(g).persist()
    o.count()
    # wedges centered at the oriented source, legs ordered by the SAME
    # (degree, id) total order the orientation uses — so the closing edge
    # u→v is oriented exactly that way in O and ONE probe direction
    # suffices (round 1 probed both, doubling the probe side)
    w = (
        o.alias("a")
        .join(o.alias("b"), F.col("a.src") == F.col("b.src"))
        .where(
            (F.col("a.dd") < F.col("b.dd"))
            | ((F.col("a.dd") == F.col("b.dd")) & (F.col("a.dst") < F.col("b.dst")))
        )
        .select(
            F.col("a.src").alias("apex"),
            F.col("a.dst").alias("u"),
            F.col("b.dst").alias("v"),
        )
    )
    closing = o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    # cache the closed-wedge stream and credit the three corners via three
    # cached scans + union.  Interleaved fresh-JVM A/B at sf0.1 (both
    # variants materialized via truncate_lineage): unions-over-cache
    # 7.4-12.4 s vs explode-one-pass 9.4-13.6 s — the explode/generate
    # plan is ~10-20% slower than three cached scans.
    #
    # NOTE on timing this operator: without the truncate_lineage below,
    # `triangles_per_vertex(g).count()` measures (almost) nothing —
    # per_vertex has provably-unique keys after groupBy, so Catalyst's
    # left-join elimination prunes the ENTIRE wedge-join subtree out of a
    # bare count().  Round-2's 3.1 s headline triangles cell was that
    # artifact; the true cost at sf0.1 is ~7-9 s.
    tris = w.join(closing, ["u", "v"], "left_semi").persist()
    per_vertex = (
        tris.select(F.col("apex").alias("id"))
        .unionByName(tris.select(F.col("u").alias("id")))
        .unionByName(tris.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = (
        g.undirected_view()
        .vertices()
        .join(per_vertex, "id", "left")
        .select("id", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
    )
    # materialize, then free BOTH scratch caches — round 2 leaked o and
    # tris for the lifetime of the session
    out = truncate_lineage(out)
    tris.unpersist()
    o.unpersist()
    return out


def triangle_count(g: LinkGraph) -> DataFrame:
    """Single-row (total_triangles) — reference's global Σ/3."""
    per_v = triangles_per_vertex(g)
    out = per_v.agg((F.sum("triangles") / 3).cast("long").alias("total_triangles"))
    from tcr_kcore_spark.superstep import propagate_release

    # release_state(out) then frees per_v's cached blocks too
    return propagate_release(out, per_v)


def local_clustering_coefficient(g: LinkGraph) -> DataFrame:
    """(id, lcc) with C_v = 2·tri_v/(deg_v·(deg_v−1)), 0 when deg<2
    (reference NaN→0, ``LocalClusteringCoeffcient.py:87-91``)."""
    from tcr_kcore_spark.superstep import propagate_release

    und = g.undirected_view()
    deg = und.degrees()
    tri = triangles_per_vertex(g)
    out = (
        tri.join(deg, "id")
        .select(
            "id",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
    return propagate_release(out, tri)


def edge_support(edges_canon: DataFrame) -> DataFrame:
    """(a, b, support): triangles through each canonical (a < b) edge of
    an undirected edge set given in canonical form.  Triangles are
    enumerated once in id order (x < y < z: (x,y) ⋈ (x,z) wedge closed by
    (y,z)) and each triangle credits its three edges — the per-edge analog
    of triangles_per_vertex's per-vertex credit."""
    e = edges_canon.select(F.col("a"), F.col("b"))
    w = (
        e.alias("p")
        .join(e.alias("q"), F.col("p.a") == F.col("q.a"))
        .where(F.col("p.b") < F.col("q.b"))
        .select(F.col("p.a").alias("x"), F.col("p.b").alias("y"), F.col("q.b").alias("z"))
    )
    tri = w.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"], "left_semi"
    )
    credits = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
        .unionByName(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    return credits.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def ktruss(
    graph: LinkGraph, k: int, max_iter: int = 1000
) -> tuple[DataFrame, "SuperstepStats"]:
    """(a, b) edges of the k-truss: the maximal subgraph in which every
    edge participates in ≥ k−2 triangles (triangles recounted INSIDE the
    surviving subgraph each round — the edge-peeling analog of the k-core
    vertex peel, D4).  Canonical a < b rows; vertices drop out implicitly
    with their last edge.  Each round is one triangle enumeration + one
    anti-filter, lineage-truncated; rounds are monotone (edges only leave)
    so a fixed-round unrolling is a valid oracle once past the fixpoint.
    Skew note: the wedge join keys on the lower-id endpoint; the
    degree-ordered orientation triangles_per_vertex uses is the hub-safe
    upgrade if id-order wedges ever skew (same trade documented there)."""
    from tcr_kcore_spark.superstep import (
        SuperstepStats,
        release_state,
        truncate_lineage,
    )

    stats = SuperstepStats()
    und = graph.undirected_view()
    cur = (
        und.edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    cur = truncate_lineage(cur)
    n_cur = cur.count()
    stats.actions += 1
    thresh = int(k) - 2
    for _ in range(max_iter):
        sup = edge_support(cur)
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= thresh)
            .select("a", "b")
        )
        nxt = truncate_lineage(nxt)
        stats.supersteps += 1
        n_nxt = nxt.count()  # survivor count carries to the next round
        stats.actions += 1
        release_state(cur)  # each round's truncated frame is scratch
        cur = nxt
        if n_nxt == n_cur or n_nxt == 0:
            stats.converged = True
            break
        n_cur = n_nxt
    return cur, stats
