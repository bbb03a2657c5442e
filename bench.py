"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set (the north_rule workload): build the co-occurrence graph,
PageRank to convergence (tol 1e-6), connected components, exact k-core
(h-index fixpoint), triangle counting, BFS, 2-round LPA.  Also reports
supersteps/sec and edges-processed/sec for the iterative jobs
(BASELINE.json metric).

Scaling-efficiency evidence (run separately, writes BENCH/BASELINE.md):

    python bench.py --scaling
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run_headline(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import (
        bfs,
        connected_components,
        kcore,
        label_propagation,
        pagerank,
    )
    from tcr_kcore_spark.operators.triangles import triangles_per_vertex
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    timings: dict[str, float] = {}
    meta: dict[str, float] = {}

    t = time.time()
    g = LinkGraph(cooccurrence_edges(spark, sf_dir), directed=False)
    n_edges = g.materialize()
    n_verts = g.vertices().count()
    timings["build_graph"] = round(time.time() - t, 3)
    meta["edges"] = n_edges
    meta["vertices"] = n_verts

    t = time.time()
    pr, st = pagerank(g, tol=1e-6, max_iter=100)
    pr.count()
    timings["pagerank_conv"] = round(time.time() - t, 3)
    meta["pagerank_supersteps"] = st.supersteps
    meta["pagerank_supersteps_per_sec"] = round(st.supersteps / timings["pagerank_conv"], 3)
    meta["pagerank_edges_per_sec"] = round(
        st.supersteps * n_edges / timings["pagerank_conv"], 0
    )

    t = time.time()
    cc, st = connected_components(g, mode="hashmin")
    cc.count()
    timings["components"] = round(time.time() - t, 3)

    t = time.time()
    kc, st = kcore(g, mode="hindex")
    kc.count()
    timings["kcore"] = round(time.time() - t, 3)
    meta["kcore_supersteps"] = st.supersteps
    meta["kcore_edges_per_sec"] = round(st.supersteps * n_edges / timings["kcore"], 0)

    t = time.time()
    tri = triangles_per_vertex(g)
    tri.count()
    timings["triangles"] = round(time.time() - t, 3)

    t = time.time()
    src = g.edges.agg(F.min("src")).first()[0]
    d, _ = bfs(g, source=int(src))
    d.count()
    timings["bfs"] = round(time.time() - t, 3)

    t = time.time()
    lp, _ = label_propagation(g, rounds=2)
    lp.count()
    timings["lpa_r2"] = round(time.time() - t, 3)

    g.unpersist()
    return {"timings": timings, "meta": meta}


def _session(cores: int, app: str):
    from tcr_kcore_spark.session import get_spark

    # big heap (GC pressure grows with thread count in local mode) and
    # RAM-disk shuffle dirs: measure compute scaling, not sandbox disk
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    return get_spark(
        app_name=app,
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    if "--scaling" in sys.argv:
        _scaling_run(sf_dir, sf)
        return

    spark = _session(cpus, "bench")
    result = _run_headline(spark, sf_dir)
    spark.stop()
    total = round(sum(result["timings"].values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": result["timings"],
        "sf": sf,
        "detail": result["meta"],
    }
    print(json.dumps(out))


def _expanded_graph(spark, sf_dir: str, copies: int):
    """Deterministic K-times-expanded co-occurrence graph: K disjoint
    id-shifted copies.  Same structure per copy, K× the edge mass — makes
    the superstep compute large enough to saturate cores (at sf0.1 the base
    graph's 2.4M edges are fixed-overhead-bound, which says nothing about
    scaling).  This stands in for the 100 TB corpus the north_rule targets."""
    from pyspark.sql import functions as F

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    base = cooccurrence_edges(spark, sf_dir)
    p = 1 + base.agg(F.max(F.greatest("src", "dst"))).first()[0]
    ks = spark.range(copies).selectExpr("id as k")
    e = base.crossJoin(ks).select(
        (F.col("src") + F.col("k") * p).alias("src"),
        (F.col("dst") + F.col("k") * p).alias("dst"),
    )
    g = LinkGraph(e, directed=False)
    return g, g.materialize()


def _scaling_job(spark, sf_dir: str, copies: int) -> dict:
    """The measured workload: fixed-iteration PageRank (8 supersteps,
    truncation amortized over 4) and 4 h-index k-core rounds."""
    import time as _t

    from tcr_kcore_spark.operators import kcore_hindex_rounds
    from tcr_kcore_spark.operators.pagerank import pagerank_fixed_iters

    g, n_edges = _expanded_graph(spark, sf_dir, copies)
    # warm-up: JIT + codegen + broadcast machinery (one cheap run)
    pagerank_fixed_iters(g, 2, truncate_every=2).count()

    t = _t.time()
    pagerank_fixed_iters(g, 8, truncate_every=4).count()
    pr_t = _t.time() - t

    t = _t.time()
    kcore_hindex_rounds(g, 4).count()
    kc_t = _t.time() - t
    g.unpersist()
    return {
        "edges": n_edges,
        "pagerank_i8_sec": round(pr_t, 2),
        "pagerank_edges_per_sec": round(8 * n_edges / pr_t, 0),
        "kcore_h4_sec": round(kc_t, 2),
        "kcore_edges_per_sec": round(4 * n_edges / kc_t, 0),
    }


def _scaling_run(sf_dir: str, sf: float) -> None:
    """Same job, same input, two parallelism levels (local[8] vs local[32])
    — the sandbox protocol for the north_rule's N→4N executor scaling
    criterion.  Writes BENCH/BASELINE.md."""
    copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "64"))
    results = {}
    for cores in (32, 8):
        spark = _session(cores, f"bench_scale_{cores}")
        results[cores] = _scaling_job(spark, sf_dir, copies)
        spark.stop()
        print(f"# local[{cores}]: {results[cores]}", file=sys.stderr)

    effs = {}
    lines = [
        "# BENCH — scaling-efficiency evidence (north_rule N→4N criterion)",
        "",
        f"Same job, same input: {copies} disjoint copies of the {sf_dir} part",
        f"co-occurrence graph = {results[32]['edges']:,} directed edges, run at",
        "local[8] (N) and local[32] (4N cores).  Throughput = superstep edge",
        "traversals/sec; efficiency = (T_8 / T_32) / 4 (linear scaling = 1.0).",
        "",
        "| job | local[8] s | local[32] s | e-traversals/s @8 | @32 | speedup | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for job in ("pagerank_i8", "kcore_h4"):
        t8 = results[8][f"{job}_sec"]
        t32 = results[32][f"{job}_sec"]
        th8 = results[8][f"{job.split('_')[0] if job.startswith('pagerank') else 'kcore'}_edges_per_sec"]
        th32 = results[32][f"{job.split('_')[0] if job.startswith('pagerank') else 'kcore'}_edges_per_sec"]
        sp = t8 / t32 if t32 else 0.0
        effs[job] = round(sp / 4, 3)
        lines.append(
            f"| {job} | {t8} | {t32} | {th8:,.0f} | {th32:,.0f} | {sp:.2f}x | {sp/4:.3f} |"
        )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": effs,
                "unit": "ratio",
                "sf": sf,
                "copies": copies,
                "local8": results[8],
                "local32": results[32],
            }
        )
    )


if __name__ == "__main__":
    main()
