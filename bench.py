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


def _build(spark, sf_dir: str):
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    g = LinkGraph(cooccurrence_edges(spark, sf_dir), directed=False)
    n_edges = g.materialize()
    return g, n_edges


def _run_headline(sf_dir: str, cpus: int, passes: int = 3) -> dict:
    """Min-of-N headline cells, N fresh-JVM passes INTERLEAVED across
    queries.

    Two measured sandbox facts drive the protocol (BENCH/BASELINE.md,
    memory):

    - one kernel per JVM: a kernel measured as the Nth job of a shared
      session is 1.5-5x slower than fresh (heap/GC contamination — kcore
      fixpoint 19.8 s fresh vs 27-28 s as job 3);
    - this shared host swings ~5-12x with external tenant load (round 3's
      single-pass harness recorded a phantom 57 s components cell; the
      identical code re-measured at 3.6-6.1 s).  Each cell therefore runs
      ``passes`` times, cycling through ALL queries before repeating any
      (so one hot host window biases one pass of each query, never every
      pass of one query), and the JSON line reports per-cell MINIMA.  All
      raw passes append to BENCH/headline_passes.jsonl.

    Graph build+cache per session is NOT counted in the query timing
    (build_graph is its own cell), matching the reference convention of
    timing the algorithm, not the load."""
    from pyspark.sql import functions as F

    def run_build():
        spark = _session(cpus, "bench_build")
        t = time.time()
        g, n_edges = _build(spark, sf_dir)
        n_verts = g.vertices().count()
        sec = round(time.time() - t, 3)
        spark.stop()
        return sec, {"edges": n_edges, "vertices": n_verts}

    def run_cell(name, fn):
        spark = _session(cpus, f"bench_{name}")
        g, _ = _build(spark, sf_dir)
        t = time.time()
        extra = fn(spark, g) or {}
        sec = round(time.time() - t, 3)
        spark.stop()
        return sec, extra

    def q_pagerank(spark, g):
        from tcr_kcore_spark.operators import pagerank

        pr, st = pagerank(g, tol=1e-6, max_iter=100, truncate_every=2)
        pr.count()
        return {
            "pagerank_supersteps": st.supersteps,
            "_pr_supersteps": st.supersteps,
        }

    def q_components(spark, g):
        from tcr_kcore_spark.operators import connected_components

        connected_components(g, mode="hashmin")[0].count()

    def q_kcore(spark, g):
        from tcr_kcore_spark.operators import kcore

        # chained supersteps (K h-rounds per materialize/convergence-check
        # action): the 306M-edge A/B (BENCH/ab_kcore_chain.jsonl) favors
        # chain=4, but at sf0.1 the same A/B reads the other way
        # (chain=4: 27.6-32.6s incl. 2 overshoot rounds vs chain=1/2:
        # 17.7-18.4s) — the intermediate-state persists cost more than the
        # tiny per-step work they save.  Headline default stays 1; the env
        # var exists for scale experiments.
        chain = int(os.environ.get("SPARK_GRAFT_KCORE_CHAIN", "1"))
        kc, st = kcore(g, mode="hindex", truncate_every=chain)
        kc.count()
        return {"kcore_supersteps": st.supersteps}

    def q_triangles(spark, g):
        from tcr_kcore_spark.operators.triangles import triangles_per_vertex

        triangles_per_vertex(g).count()

    def q_bfs(spark, g):
        from tcr_kcore_spark.operators import bfs

        src = g.edges.agg(F.min("src")).first()[0]
        bfs(g, source=int(src))[0].count()

    def q_lpa(spark, g):
        from tcr_kcore_spark.operators import label_propagation

        label_propagation(g, rounds=2)[0].count()

    cells = [
        ("build_graph", None),
        ("pagerank_conv", q_pagerank),
        ("components", q_components),
        ("kcore", q_kcore),
        ("triangles", q_triangles),
        ("bfs", q_bfs),
        ("lpa_r2", q_lpa),
    ]
    timings: dict[str, float] = {}
    worst: dict[str, float] = {}
    meta: dict[str, float] = {}
    raw: list[dict] = []
    for p in range(passes):
        pass_t: dict[str, float] = {}
        for name, fn in cells:
            sec, extra = run_build() if fn is None else run_cell(name, fn)
            pass_t[name] = sec
            worst[name] = max(worst.get(name, 0.0), sec)
            if name not in timings or sec < timings[name]:
                timings[name] = sec
                meta.update(extra)  # counters are deterministic; keep the
                # ones observed alongside the minimum wall time
        raw.append(pass_t)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/headline_passes.jsonl", "a") as f:
        for i, pass_t in enumerate(raw):
            f.write(
                json.dumps(
                    {
                        "ts": round(time.time(), 1),
                        "pass": i,
                        "sf_dir": sf_dir,
                        "cpus": cpus,
                        "timings": pass_t,
                    }
                )
                + "\n"
            )

    n_edges = meta.get("edges", 0)
    prs = meta.pop("_pr_supersteps", 0)
    if prs:
        meta["pagerank_supersteps_per_sec"] = round(prs / timings["pagerank_conv"], 3)
        meta["pagerank_edges_per_sec"] = round(
            prs * n_edges / timings["pagerank_conv"], 0
        )
    if meta.get("kcore_supersteps"):
        meta["kcore_edges_per_sec"] = round(
            meta["kcore_supersteps"] * n_edges / timings["kcore"], 0
        )
    meta["passes"] = passes
    # per-cell max/min across passes: the host-noise signature (≈1 quiet)
    meta["spread"] = {
        k: round(worst[k] / v, 2) if v else 0.0 for k, v in timings.items()
    }
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
    if "--hub" in sys.argv:
        _hub_run(sf_dir, sf, cpus)
        return

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    result = _run_headline(sf_dir, cpus, passes=passes)
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


def _hub_run(sf_dir: str, sf: float, cpus: int) -> None:
    """Skew evidence: the same kernels on the base graph vs the base graph
    plus a planted 10^5-degree hub.  The h-operator's distinct-value
    aggregation and LPA's two-level mode are map-side combinable, so the
    hub must not serialize a task — wall time stays within a small factor
    of the hub-free run even though one vertex carries 100k edges."""
    import time as _t

    from pyspark.sql import functions as F

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import kcore_hindex_rounds, label_propagation
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    spark = _session(cpus, "bench_hub")
    base = cooccurrence_edges(spark, sf_dir)
    hub_id = -1
    n_hub = 100_000
    spokes = spark.range(n_hub).select(
        F.lit(hub_id).cast("long").alias("src"), (F.col("id") + 10_000_000).alias("dst")
    )
    hub_edges = spokes.unionByName(
        spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = {"hub_degree": n_hub}
    for name, edges in (("base", base), ("base_plus_hub", base.unionByName(hub_edges))):
        g = LinkGraph(edges, directed=False)
        g.materialize()
        t = _t.time()
        kcore_hindex_rounds(g, 4, truncate_every=4).count()
        out[f"kcore_h4_{name}_sec"] = round(_t.time() - t, 2)
        t = _t.time()
        label_propagation(g, rounds=2)[0].count()
        out[f"lpa_r2_{name}_sec"] = round(_t.time() - t, 2)
        g.unpersist()
    spark.stop()
    print(json.dumps({"metric": "hub_skew", "value": out, "unit": "sec", "sf": sf}))


def _expanded_graph(spark, sf_dir: str, copies: int, disjoint: bool = True):
    """Deterministic K-times-expanded co-occurrence graph.

    disjoint=True: K id-shifted copies (K× vertices AND edges) — stresses
    V-sized state handling.  disjoint=False: a K-fold multigraph (same 20k
    vertices, K× parallel edges with distinct weights) — K× edge compute
    against cache-resident state, isolating the superstep kernel's compute
    scaling from the single-box memory-bandwidth/broadcast serial terms.
    Both stand in for the 100 TB corpus the north_rule targets (at sf0.1
    the base graph's 2.4M edges are fixed-overhead-bound and say nothing
    about scaling)."""
    from pyspark.sql import functions as F

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    base = cooccurrence_edges(spark, sf_dir)
    ks = spark.range(copies).selectExpr("id as k")
    if disjoint:
        p = 1 + base.agg(F.max(F.greatest("src", "dst"))).first()[0]
        e = base.crossJoin(ks).select(
            (F.col("src") + F.col("k") * p).alias("src"),
            (F.col("dst") + F.col("k") * p).alias("dst"),
        )
        g = LinkGraph(e, directed=False)
        return g, g.materialize()
    # multigraph: keep (src, dst, copy) so PageRank's outdeg fold sees K
    # parallel edges per pair; dedup disabled downstream by construction
    e = base.crossJoin(ks).select("src", "dst", F.col("k").alias("copy"))
    g = LinkGraph(e, directed=False)
    return g, g.materialize()


def _scaling_job(spark, sf_dir: str, copies: int, part: str = "all") -> dict:
    """Three measured jobs per parallelism level:

    - codegen_control: pure whole-stage-codegen arithmetic (40B rows) — the
      platform's compute-scaling ceiling on this box (≈0.76-0.80 measured;
      one shared memory controller + JVM overheads cap it below 1.0);
    - pagerank_i8 / kcore_h4 on the K-fold multigraph (cache-resident
      state): the superstep kernels, compute-bound;
    - pagerank_i8_disjoint on K disjoint copies (K× vertices): end-to-end
      including V-sized broadcast builds — the serial term a single-box
      4N-thread run cannot hide (a real N→4N cluster builds broadcasts
      per executor in parallel).
    """
    import time as _t

    from tcr_kcore_spark.operators import kcore_hindex_rounds
    from tcr_kcore_spark.operators.pagerank import pagerank_fixed_iters

    out = {}
    if part in ("all", "kernels"):
        t = _t.time()
        spark.range(0, 40_000_000_000, 1, 128).selectExpr("sum(id % 7)").first()
        out["codegen_control_sec"] = round(_t.time() - t, 2)

        g, n_edges = _expanded_graph(spark, sf_dir, copies, disjoint=False)
        out["edges"] = n_edges
        pagerank_fixed_iters(g, 2, truncate_every=2).count()  # warm-up

        t = _t.time()
        pagerank_fixed_iters(g, 8, truncate_every=4).count()
        out["pagerank_i8_sec"] = round(_t.time() - t, 2)
        out["pagerank_edges_per_sec"] = round(8 * n_edges / out["pagerank_i8_sec"], 0)

        t = _t.time()
        kcore_hindex_rounds(g, 4, truncate_every=4).count()
        out["kcore_h4_sec"] = round(_t.time() - t, 2)
        out["kcore_edges_per_sec"] = round(4 * n_edges / out["kcore_h4_sec"], 0)
        g.unpersist()

    if part in ("all", "disjoint"):
        gd, nd = _expanded_graph(spark, sf_dir, max(copies // 2, 1), disjoint=True)
        pagerank_fixed_iters(gd, 2, truncate_every=2).count()
        t = _t.time()
        pagerank_fixed_iters(gd, 8, truncate_every=4).count()
        out["pagerank_i8_disjoint_sec"] = round(_t.time() - t, 2)
        out["disjoint_edges"] = nd
        gd.unpersist()

    if part in ("all", "disjoint_shuffle"):
        # the NORTH-RULE regime: at 10^12 files the V-row state cannot
        # broadcast, so the engine runs the shuffle plan (src-partitioned
        # cached edges; per-superstep exchange = V-row state + combined
        # messages, no driver-serial broadcast builds).  This is the row
        # the N→4N criterion should be judged on.
        os.environ["SPARK_GRAFT_BROADCAST_MAX_ROWS"] = "0"
        try:
            gd, nd = _expanded_graph(spark, sf_dir, max(copies // 2, 1), disjoint=True)
            pagerank_fixed_iters(gd, 2, truncate_every=2).count()
            t = _t.time()
            pagerank_fixed_iters(gd, 8, truncate_every=4).count()
            out["pagerank_i8_shuffle_sec"] = round(_t.time() - t, 2)
            out["shuffle_edges"] = nd
            gd.unpersist()
        finally:
            del os.environ["SPARK_GRAFT_BROADCAST_MAX_ROWS"]
    return out


def _scaling_run(sf_dir: str, sf: float) -> None:
    """Same job, same input, two parallelism levels (local[8] vs local[32])
    — the sandbox protocol for the north_rule's N→4N executor scaling
    criterion.  Writes BENCH/BASELINE.md."""
    copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "128"))
    results = {}
    # one fresh JVM per (cores, job-group): heap/GC state from a 306M-row
    # job measurably contaminates the next job's timing in the same JVM
    for cores in (32, 8):
        acc = {}
        for part in ("kernels", "disjoint", "disjoint_shuffle"):
            spark = _session(cores, f"bench_scale_{cores}_{part}")
            acc.update(_scaling_job(spark, sf_dir, copies, part))
            spark.stop()
        results[cores] = acc
        print(f"# local[{cores}]: {acc}", file=sys.stderr)

    effs = {}
    lines = [
        "# BENCH — scaling-efficiency evidence (north_rule N→4N criterion)",
        "",
        "Sandbox protocol: no multi-machine cluster exists here, so the same",
        "job runs on the same input at local[8] (N) and local[32] (4N cores).",
        f"Workload graphs derive from {sf_dir}: a {copies}-fold multigraph",
        f"({results[32]['edges']:,} directed edges over 20k vertices —",
        "cache-resident state isolates the superstep kernels' compute",
        f"scaling) and {copies // 2} disjoint copies ({results[32]['disjoint_edges']:,}",
        "edges — includes V-sized per-superstep broadcast builds, a cost a",
        "single shared-memory box serializes but a real N→4N cluster spreads",
        "across executors).  codegen_control is pure whole-stage-codegen",
        "arithmetic — the platform's measured scaling ceiling for 8→32",
        "threads in ONE JVM on ONE memory controller.",
        "",
        "Efficiency = (T_8 / T_32) / 4 (linear scaling = 1.0).",
        "",
        "| job | local[8] s | local[32] s | speedup | efficiency | eff. vs platform ceiling |",
        "|---|---|---|---|---|---|",
    ]
    ctrl_sp = results[8]["codegen_control_sec"] / results[32]["codegen_control_sec"]
    for job in (
        "codegen_control",
        "pagerank_i8",
        "kcore_h4",
        "pagerank_i8_disjoint",
        "pagerank_i8_shuffle",
    ):
        t8 = results[8][f"{job}_sec"]
        t32 = results[32][f"{job}_sec"]
        sp = t8 / t32 if t32 else 0.0
        effs[job] = round(sp / 4, 3)
        rel = sp / ctrl_sp if ctrl_sp else 0.0
        lines.append(
            f"| {job} | {t8} | {t32} | {sp:.2f}x | {sp/4:.3f} | {rel:.3f} |"
        )
    lines += [
        "",
        f"Superstep throughput (multigraph): "
        f"{results[8]['pagerank_edges_per_sec']:,.0f} edge-traversals/s at",
        f"local[8] → {results[32]['pagerank_edges_per_sec']:,.0f} at local[32] "
        f"(PageRank); {results[8]['kcore_edges_per_sec']:,.0f} → "
        f"{results[32]['kcore_edges_per_sec']:,.0f} (k-core h-rounds).",
        "",
        "Reading: the platform itself caps 8→32-thread scaling below 1.0",
        "(shared DRAM + single JVM); the engine's compute kernels should be",
        "judged against that ceiling (last column).  The disjoint-copies row",
        "shows the end-to-end figure including driver-serial broadcast",
        "builds, which on a real multi-executor cluster are per-executor",
        "parallel work.",
    ]
    os.makedirs("BENCH", exist_ok=True)
    # single-pass snapshot; BENCH/BASELINE.md is curated manually from the
    # minima of repeated passes (this shared host varies up to ~5x per cell)
    with open("BENCH/SCALING_LAST.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open("BENCH/passes.jsonl", "a") as f:
        f.write(json.dumps({"local8": results[8], "local32": results[32]}) + "\n")
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
