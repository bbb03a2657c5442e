"""Scaling pairs for the BASELINE.json metric AS STATED: supersteps/sec
and edges-processed/sec TO CONVERGENCE — PageRank at tol 1e-6 and exact
k-core (h-index fixpoint = exact coreness) — on the K-fold multigraph,
local[8] vs local[32], fresh JVM per cell, same-window pairs per job.

Appends raw cells to BENCH/convergence_scaling.jsonl.

Usage: python scripts/scaling_convergence.py [passes]
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


def cell(job: str, cores: int) -> dict:
    spark = _session(cores, f"sc_{job}_{cores}")
    g, n_edges = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    from tcr_kcore_spark.operators import kcore, pagerank

    t = time.time()
    if job == "pagerank_conv":
        _, st = pagerank(g, tol=1e-6, max_iter=200, truncate_every=2)
    else:
        _, st = kcore(g, mode="hindex")
    secs = round(time.time() - t, 2)
    spark.stop()
    return {
        "supersteps": st.supersteps,
        "converged": st.converged,
        "secs": secs,
        "supersteps_per_sec": round(st.supersteps / secs, 3),
        "edges_per_sec": round(st.supersteps * n_edges / secs, 0),
        "edges": n_edges,
    }


def main() -> None:
    os.makedirs("BENCH", exist_ok=True)
    for p in range(PASSES):
        row: dict = {"pass": p, "t": round(time.time(), 1), "copies": COPIES,
                     "load1": os.getloadavg()[0]}
        for job in ("pagerank_conv", "kcore_exact"):
            c32 = cell(job, 32)
            c8 = cell(job, 8)
            row[job] = {"local32": c32, "local8": c8,
                        "eff": round(c8["secs"] / c32["secs"] / 4, 3)}
            print(json.dumps({job: row[job]}), flush=True)
        with open("BENCH/convergence_scaling.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
