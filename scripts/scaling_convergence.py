"""Scaling pairs for the BASELINE.json metric AS STATED: supersteps/sec
and edges-processed/sec TO CONVERGENCE — PageRank at tol 1e-6 and exact
k-core (h-index fixpoint = exact coreness) — on the K-fold multigraph,
same input at multiple parallelism levels, fresh JVM per cell.

v3 methodology (round 5).  v2 split BUILD (graph load + edge-cache
materialization) from ITERATE (the superstep loop on a warm cache) and ran
a codegen control inside the same invocation; its committed rows exposed a
platform fact: the zero-engine-code CPU control itself never scales past
~0.64 from 8→32 threads on this box (frequency scaling + shared cache),
and the superstep kernels are *memory-bound* (each superstep re-scans the
cached E-row edge table), so 8→32 additionally hits the memory-bandwidth
wall.  An engine cannot out-scale its platform's control.  v3 therefore:

- warms the JIT: every control scan runs twice in-session, min taken;
- adds a MEMORY-BOUND control (sum over a cached 400M-row table — a warm
  columnar-cache scan with zero engine code): the honest platform ceiling
  for cache-scan-shaped kernels, next to the CPU-bound codegen control;
- measures a configurable core ladder (default 2, 8, 32) so the N→4N
  criterion is evidenced at BOTH (2,8) — where the box's memory system is
  not saturated and scaling is readable — and (8,32) — where the controls
  themselves document the platform wall.  On a real 1000-executor cluster
  the (2,8) regime is the relevant one: each executor adds its own memory
  channels, so per-node bandwidth is never shared the way threads on this
  one socket share it.

``eff_iterate`` per pair is the criterion number; the two controls tell
you what the box could possibly show in that window.

Appends raw passes to BENCH/convergence_scaling.jsonl (schema v3: rows
carry "v": 3; older v1/v2 rows retained for history).

Usage: python scripts/scaling_convergence.py [passes]
Env:   SPARK_GRAFT_SCALE_COPIES (default 32)
       SPARK_GRAFT_SCALE_CORES (default "2,8,32")
       SPARK_GRAFT_SCALE_JOBS (default "pagerank_conv,kcore_exact")
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _expanded_graph, _session

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 1
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "32"))
CORES = [
    int(c) for c in os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8,32").split(",")
]
JOBS = os.environ.get(
    "SPARK_GRAFT_SCALE_JOBS", "pagerank_conv,kcore_exact"
).split(",")


def codegen_cell(cores: int) -> float:
    """Zero-engine-code whole-stage-codegen scan (CPU-bound, no memory
    traffic: range ids are generated arithmetically).  Min of two
    in-session runs so the JIT-compiled pass is the one timed."""
    spark = _session(cores, f"sc_cg_{cores}")
    times = []
    for _ in range(2):
        t = time.time()
        spark.range(0, 20_000_000_000, 1, 128).selectExpr("sum(id % 7)").first()
        times.append(time.time() - t)
    spark.stop()
    return round(min(times), 2)


def memscan_cell(cores: int) -> float:
    """Zero-engine-code warm columnar-cache scan (memory-bound): the
    platform ceiling for kernels that re-scan a cached edge table every
    superstep — exactly the superstep shape.  Min of two warm scans."""
    spark = _session(cores, f"sc_ms_{cores}")
    df = (
        spark.range(0, 400_000_000, 1, 128)
        .selectExpr("id", "id * 3 as a", "id % 1000 as b")
        .persist()
    )
    df.count()  # materialize the cache (not timed)
    times = []
    for _ in range(2):
        t = time.time()
        df.selectExpr("sum(a + b)").first()
        times.append(time.time() - t)
    df.unpersist()
    spark.stop()
    return round(min(times), 2)


def cell(job: str, cores: int) -> dict:
    spark = _session(cores, f"sc_{job}_{cores}")
    t0 = time.time()
    g, n_edges = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    from tcr_kcore_spark.operators import kcore, pagerank

    if job == "pagerank_conv":
        _, st = pagerank(g, tol=1e-6, max_iter=200, truncate_every=2)
    else:
        _, st = kcore(
            g,
            mode="hindex",
            truncate_every=int(os.environ.get("SPARK_GRAFT_KCORE_CHAIN", "1")),
        )
    total = round(time.time() - t0, 2)
    spark.stop()
    iterate = round(st.wall_secs, 2)
    return {
        "supersteps": st.supersteps,
        "converged": st.converged,
        "secs_total": total,
        "secs_build": round(total - iterate, 2),
        "secs_iterate": iterate,
        "supersteps_per_sec": round(st.supersteps / iterate, 3),
        "edges_per_sec_iterate": round(st.supersteps * n_edges / iterate, 0),
        "edges": n_edges,
    }


def _pair_effs(by_cores: dict, key) -> dict:
    """Efficiency for each adjacent (n, m) pair in the core ladder:
    (t_n / t_m) / (m / n) — 1.0 = perfectly linear."""
    out = {}
    ladder = sorted(by_cores)
    for lo, hi in zip(ladder, ladder[1:]):
        t_lo, t_hi = key(by_cores[lo]), key(by_cores[hi])
        if t_lo and t_hi:
            out[f"eff_{lo}_{hi}"] = round((t_lo / t_hi) / (hi / lo), 3)
    return out


def main() -> None:
    os.makedirs("BENCH", exist_ok=True)
    for p in range(PASSES):
        row: dict = {
            "v": 3,
            "pass": p,
            "t": round(time.time(), 1),
            "copies": COPIES,
            "cores": CORES,
            "load1": os.getloadavg()[0],
        }
        for name, fn in (("codegen_control", codegen_cell), ("memscan_control", memscan_cell)):
            secs = {c: fn(c) for c in sorted(CORES, reverse=True)}
            row[name] = {"secs": {str(c): s for c, s in secs.items()}}
            row[name].update(_pair_effs(secs, lambda s: s))
            print(json.dumps({name: row[name]}), flush=True)
        for job in JOBS:
            cells = {c: cell(job, c) for c in sorted(CORES, reverse=True)}
            row[job] = {f"local{c}": d for c, d in cells.items()}
            row[job].update(
                {
                    f"iterate_{k}": v
                    for k, v in _pair_effs(
                        cells, lambda d: d["secs_iterate"]
                    ).items()
                }
            )
            row[job].update(
                {
                    f"total_{k}": v
                    for k, v in _pair_effs(cells, lambda d: d["secs_total"]).items()
                }
            )
            print(json.dumps({job: row[job]}), flush=True)
        row["load1_end"] = os.getloadavg()[0]
        with open("BENCH/convergence_scaling.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
