"""Capture .explain("formatted") for the query paths touched in r06.

Usage: python scripts/capture_plans.py before|after [unit ...]

Writes plans/r06/<unit>_<suffix>.txt.  For iterative operators the
returned frame is a truncated (bare-scan) frame, so the meaningful plan
is ONE superstep's lazy plan — captured by building the step function's
output against the same cached inputs the operator uses.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _graph(spark):
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    g = LinkGraph(cooccurrence_edges(spark, SF_DIR), directed=False)
    g.materialize()
    return g


def plan_edges_cooccur(spark):
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    return _explain_str(cooccurrence_edges(spark, SF_DIR))


def plan_vertices(spark):
    return _explain_str(_graph(spark).vertices())


def plan_kcore_hindex_round(spark):
    from pyspark.sql import functions as F

    from tcr_kcore_spark.operators.kcore import _HUB_WINDOW_MAX_DEG, _hindex_round
    from tcr_kcore_spark.plans.partitioning import plan_superstep_edges

    g = _graph(spark)
    edges = plan_superstep_edges(g.edges.select("src", "dst"), True).persist()
    edges.count()
    degrees = g.degrees()
    est = degrees.select("id", F.col("degree").cast("long").alias("est"))
    from tcr_kcore_spark.superstep import truncate_lineage

    est = truncate_lineage(est)
    out = _hindex_round(edges, est, None, True, False)
    return _explain_str(out)


def plan_kcore_exact(spark):
    """Top-level plan of the kcore(mode=hindex) result (post-materialize
    scan) plus, when the local fast path is active, the local-kernel plan."""
    from tcr_kcore_spark.operators import kcore

    g = _graph(spark)
    r, st = kcore(g, mode="hindex")
    return (
        f"# supersteps={st.supersteps} local_finish_secs={st.local_finish_secs}\n"
        + _explain_str(r)
    )


def plan_pagerank_step_operator(spark):
    """One superstep's plan as the OPERATOR currently builds it (uses the
    module's step closure via a 1-iteration probe with explain hook)."""
    import importlib

    pr_mod = importlib.import_module("tcr_kcore_spark.operators.pagerank")

    g = _graph(spark)
    plans = []
    import tcr_kcore_spark.superstep as ss

    orig = ss.truncate_lineage

    def capture(df):
        plans.append(_explain_str(df))
        return orig(df)

    ss.truncate_lineage = capture
    try:
        pr_mod.pagerank(g, tol=-1.0, max_iter=1)
    finally:
        ss.truncate_lineage = orig
    # plans[0] = init truncation, plans[1] = first step's full lazy plan
    return plans[-1]


def _capture_operator_step(spark, run):
    """Generic: hook truncate_lineage, run `run`, return last captured
    step plan (plans[0] is the init truncation)."""
    import tcr_kcore_spark.superstep as ss

    plans = []
    orig = ss.truncate_lineage

    def capture(df):
        plans.append(_explain_str(df))
        return orig(df)

    ss.truncate_lineage = capture
    try:
        run()
    finally:
        ss.truncate_lineage = orig
    return plans[-1]


def plan_components_step(spark):
    from tcr_kcore_spark.operators import connected_components

    g = _graph(spark)
    return _capture_operator_step(
        spark, lambda: connected_components(g, mode="hashmin", max_iter=1)
    )


def plan_bfs_step(spark):
    from pyspark.sql import functions as F

    from tcr_kcore_spark.operators import bfs

    g = _graph(spark)
    src = int(g.edges.agg(F.min("src")).first()[0])
    return _capture_operator_step(spark, lambda: bfs(g, source=src, max_iter=1))


def plan_lpa_round(spark):
    from tcr_kcore_spark.operators import label_propagation

    g = _graph(spark)
    return _capture_operator_step(spark, lambda: label_propagation(g, rounds=1))


def plan_triangles(spark):
    """The full lazy triangle plan (pre-truncation), mirroring
    triangles_per_vertex's CURRENT shape (r6: no eager o.count, broadcast
    zero-fill under the V-row regime)."""
    from pyspark.sql import functions as F

    from tcr_kcore_spark.operators.triangles import _oriented
    from tcr_kcore_spark.plans.partitioning import broadcast_max_rows

    g = _graph(spark)
    verts = g.undirected_view().vertices().persist()
    vrow = verts.agg(
        F.count(F.lit(1)).alias("n"), F.min("id").alias("mn"), F.max("id").alias("mx")
    ).first()
    use_int = (
        vrow["mn"] is not None and vrow["mn"] >= -(2**31) and vrow["mx"] < 2**31
    )
    o = _oriented(g)
    if use_int:
        o = o.select(
            F.col("src").cast("int"), F.col("dst").cast("int"), F.col("dd").cast("int")
        )
    o = o.persist()
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
    tris = w.join(closing, ["u", "v"], "left_semi")
    per_vertex = (
        tris.select(F.col("apex").alias("id"))
        .unionByName(tris.select(F.col("u").alias("id")))
        .unionByName(tris.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    if use_int:
        per_vertex = per_vertex.select(F.col("id").cast("long").alias("id"), "triangles")
    if vrow["n"] <= broadcast_max_rows():
        per_vertex = F.broadcast(per_vertex)
    out = verts.join(per_vertex, "id", "left").select(
        "id", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
    )
    return _explain_str(out)


def plan_ktruss_support(spark):
    from pyspark.sql import functions as F

    from tcr_kcore_spark.operators.triangles import edge_support

    g = _graph(spark)
    cur = (
        g.undirected_view()
        .edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    from tcr_kcore_spark.superstep import truncate_lineage

    cur = truncate_lineage(cur)
    return _explain_str(edge_support(cur))


def plan_scc_minprop_round(spark):
    from pyspark.sql import functions as F

    from tcr_kcore_spark.superstep import truncate_lineage

    # directed corpus-style graph: order->part edges
    from tcr_kcore_spark.sources.relational import order_part_edges

    e = truncate_lineage(order_part_edges(spark, SF_DIR).limit(200000))
    verts = truncate_lineage(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = truncate_lineage(
        verts.select("id", F.col("id").alias("lab"), F.lit(True).alias("chg"))
    )
    frontier = state.where("chg").select(F.col("id").alias("src"), "lab")
    msgs = (
        e.join(frontier, "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("lab").alias("m"))
    )
    new = (
        state.join(msgs, "id", "left")
        .select(
            "id",
            F.least(F.col("lab"), F.coalesce(F.col("m"), F.col("lab"))).alias("nl"),
            "lab",
        )
        .select("id", F.col("nl").alias("lab"), (F.col("nl") < F.col("lab")).alias("chg"))
    )
    return _explain_str(new)


UNITS = {
    "edges_cooccur": plan_edges_cooccur,
    "vertices": plan_vertices,
    "kcore_hindex_round": plan_kcore_hindex_round,
    "kcore_exact": plan_kcore_exact,
    "pagerank_step": plan_pagerank_step_operator,
    "components_step": plan_components_step,
    "bfs_step": plan_bfs_step,
    "lpa_round": plan_lpa_round,
    "triangles": plan_triangles,
    "ktruss_support": plan_ktruss_support,
    "scc_minprop_round": plan_scc_minprop_round,
}


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(UNITS)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), f"plans_{suffix}")
    for name in names:
        try:
            text = UNITS[name](spark)
        except Exception as exc:  # capture what we can, keep going
            text = f"ERROR capturing {name}: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
