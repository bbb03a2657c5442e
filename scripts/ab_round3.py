"""Interleaved A/B evidence for round-3 engine changes (fresh JVM per cell,
alternating variants so both sides see the same host window):

  A) HITS per-step cache held vs round-2 immediate unpersist
     (SPARK_GRAFT_HITS_HOLD) — hits_i4 on the sf0.1 order->part graph;
  B) kcore h-index FIXPOINT truncate_every=1 vs 2 with the new
     chained-intermediate persist (round 2 measured chaining LOSING 34s vs
     21s because the changed-pruning consumed the unmaterialized previous
     step 3x).

Usage: python scripts/ab_round3.py [reps] [sf_dir]
Appends raw cells to BENCH/ab_round3.jsonl and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def _session(app):
    from bench import _session as s

    return s(32, app)


def run_hits(hold: bool) -> float:
    os.environ["SPARK_GRAFT_HITS_HOLD"] = "1" if hold else "0"
    try:
        from tcr_kcore_spark.graph import LinkGraph
        from tcr_kcore_spark.operators import hits
        from tcr_kcore_spark.sources.relational import order_part_edges

        spark = _session(f"ab_hits_{hold}")
        g = LinkGraph(order_part_edges(spark, SF_DIR), directed=True)
        g.materialize()
        t = time.time()
        out, _ = hits(g, max_iter=4, tol=-1.0)
        out.count()
        dt = time.time() - t
        spark.stop()
        return round(dt, 2)
    finally:
        del os.environ["SPARK_GRAFT_HITS_HOLD"]


def run_kcore(tr: int) -> float:
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import kcore
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    spark = _session(f"ab_kcore_tr{tr}")
    g = LinkGraph(cooccurrence_edges(spark, SF_DIR), directed=False)
    g.materialize()
    t = time.time()
    out, st = kcore(g, mode="hindex", truncate_every=tr)
    out.count()
    dt = time.time() - t
    spark.stop()
    return round(dt, 2)


def main():
    cells = []
    for rep in range(REPS):
        row = {"rep": rep, "t": time.time()}
        row["hits_hold"] = run_hits(True)
        row["hits_nohold"] = run_hits(False)
        row["kcore_tr1"] = run_kcore(1)
        row["kcore_tr2"] = run_kcore(2)
        row["load1"] = os.getloadavg()[0]
        cells.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ab_round3.jsonl", "a") as f:
        for row in cells:
            f.write(json.dumps(row) + "\n")
    mins = {
        k: min(c[k] for c in cells)
        for k in ("hits_hold", "hits_nohold", "kcore_tr1", "kcore_tr2")
    }
    print(json.dumps({"minima": mins}))


if __name__ == "__main__":
    main()
