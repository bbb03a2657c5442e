"""Isolate the chained-intermediate cache's effect on the h-round kernel at
multigraph scale (306M edges): interleaved cells, fresh session per cell,
32 cores.  Variants: tr4_cache (current default), tr4_nocache
(SPARK_GRAFT_CHAIN_CACHE=0 — the round-2 chained-lazy shape), tr1.

Usage: python scripts/ab_kcore_chain.py [reps] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _expanded_graph, _session  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 128
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cell(tr: int, cache: bool) -> float:
    from tcr_kcore_spark.operators import kcore_hindex_rounds

    os.environ["SPARK_GRAFT_CHAIN_CACHE"] = "1" if cache else "0"
    try:
        spark = _session(32, f"ab_kc_tr{tr}_c{int(cache)}")
        g, _ = _expanded_graph(spark, SF_DIR, COPIES, disjoint=False)
        kcore_hindex_rounds(g, 2, truncate_every=min(tr, 2)).count()  # warm-up
        t = time.time()
        kcore_hindex_rounds(g, 4, truncate_every=tr).count()
        dt = round(time.time() - t, 2)
        g.unpersist()
        spark.stop()
        return dt
    finally:
        del os.environ["SPARK_GRAFT_CHAIN_CACHE"]


def main():
    rows = []
    for rep in range(REPS):
        row = {"rep": rep, "t": time.time(), "load1": os.getloadavg()[0]}
        row["tr4_cache"] = cell(4, True)
        row["tr4_nocache"] = cell(4, False)
        row["tr1"] = cell(1, True)
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("BENCH/ab_kcore_chain.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(json.dumps({"minima": {k: min(r[k] for r in rows) for k in ("tr4_cache", "tr4_nocache", "tr1")}}))


if __name__ == "__main__":
    main()
