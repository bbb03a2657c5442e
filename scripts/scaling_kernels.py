"""Tight same-window scaling passes for the superstep KERNEL rows
(pagerank_i8 / kcore_h4 on the 128-fold multigraph + codegen control).

Two methodology fixes over bench.py --scaling:

- ONE KERNEL PER JVM: running kcore after pagerank's 306M-row churn in the
  same JVM degrades the kcore cell 2-5x (measured: fresh-session kcore_h4
  26.8-36.3 s at local[32] vs 67-151 s as the second job of a shared
  session).  Heap/GC contamination, not engine behavior.
- 32/8 cells for the SAME kernel run BACK TO BACK, so each efficiency
  ratio comes from one host window (this box swings ~5x between windows).

Appends raw cells to BENCH/passes_kernels2.jsonl.

Usage: python scripts/scaling_kernels.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _expanded_graph, _session  # noqa: E402

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "128"))


def codegen_cell(cores: int) -> float:
    spark = _session(cores, f"sk_cg_{cores}")
    t = time.time()
    spark.range(0, 40_000_000_000, 1, 128).selectExpr("sum(id % 7)").first()
    dt = round(time.time() - t, 2)
    spark.stop()
    return dt


def pagerank_cell(cores: int) -> float:
    from tcr_kcore_spark.operators.pagerank import pagerank_fixed_iters

    spark = _session(cores, f"sk_pr_{cores}")
    g, _ = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    pagerank_fixed_iters(g, 2, truncate_every=2).count()  # warm-up
    t = time.time()
    pagerank_fixed_iters(g, 8, truncate_every=4).count()
    dt = round(time.time() - t, 2)
    g.unpersist()
    spark.stop()
    return dt


def kcore_cell(cores: int) -> float:
    from tcr_kcore_spark.operators import kcore_hindex_rounds

    spark = _session(cores, f"sk_kc_{cores}")
    g, _ = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    kcore_hindex_rounds(g, 2, truncate_every=2).count()  # warm-up
    t = time.time()
    kcore_hindex_rounds(g, 4, truncate_every=4).count()
    dt = round(time.time() - t, 2)
    g.unpersist()
    spark.stop()
    return dt


def components_cell(cores: int) -> float:
    """Connected components TO CONVERGENCE (hashmin) — one of the four
    north_rule-named algorithms; the multigraph's parallel edges do not
    change labels, so the work is a pure E-sized kernel at K× rows."""
    from tcr_kcore_spark.operators import connected_components

    spark = _session(cores, f"sk_cc_{cores}")
    g, _ = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    from tcr_kcore_spark.operators import label_propagation

    label_propagation(g, rounds=1)[0].count()  # warm-up (same join shape)
    t = time.time()
    connected_components(g, mode="hashmin")[0].count()
    dt = round(time.time() - t, 2)
    g.unpersist()
    spark.stop()
    return dt


def lpa_cell(cores: int) -> float:
    """2-round label propagation (north_rule-named; the two-hash-agg mode
    count weighs each parallel edge, K× message rows)."""
    from tcr_kcore_spark.operators import label_propagation

    spark = _session(cores, f"sk_lpa_{cores}")
    g, _ = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
    label_propagation(g, rounds=1)[0].count()  # warm-up
    t = time.time()
    label_propagation(g, rounds=2)[0].count()
    dt = round(time.time() - t, 2)
    g.unpersist()
    spark.stop()
    return dt


def triangles_cell(cores: int) -> float:
    """Per-vertex triangle counting (north_rule-named) on the disjoint
    x(COPIES/8) expansion — parallel edges would corrupt wedge counts, so
    the multigraph is not usable here; disjoint copies preserve per-copy
    density (the wedge join's cost driver)."""
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators.triangles import triangles_per_vertex
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    spark = _session(cores, f"sk_tri_{cores}")
    warm = LinkGraph(cooccurrence_edges(spark, SF_DIR), directed=False)
    warm.materialize()
    triangles_per_vertex(warm).count()  # warm-up at 1x
    warm.unpersist()
    gd, _ = _expanded_graph(spark, SF_DIR, max(COPIES // 8, 1), disjoint=True)
    t = time.time()
    triangles_per_vertex(gd).count()
    dt = round(time.time() - t, 2)
    gd.unpersist()
    spark.stop()
    return dt


CELLS = {"codegen_control": codegen_cell, "pagerank_i8": pagerank_cell,
         "kcore_h4": kcore_cell, "components": components_cell,
         "lpa_r2": lpa_cell, "triangles": triangles_cell}


def main():
    os.makedirs("BENCH", exist_ok=True)
    for p in range(PASSES):
        row = {"pass": p, "t": time.time(), "load1": os.getloadavg()[0]}
        for job, fn in CELLS.items():
            t32 = fn(32)
            t8 = fn(8)
            row[f"{job}_32"] = t32
            row[f"{job}_8"] = t8
            row[f"eff_{job}"] = round(t8 / t32 / 4, 3)
        with open("BENCH/passes_kernels2.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
