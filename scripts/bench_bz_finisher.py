"""Measure the single-task BZ local-finisher kernel (VERDICT r3 item #4).

The peel mode hands residuals up to ``local_finish_edges`` (default 8M) to
``_bz_finish_kernel`` — an interpreted-Python O(E) loop over NumPy arrays in
ONE task.  This times the kernel in-process (no Spark — the applyInPandas
wrapper adds only Arrow transfer) on symmetric subgraphs of the sf0.1
co-occurrence graph at three sizes, appending rows to
BENCH/bz_finisher.jsonl.  The default cap is justified by these numbers.

Usage: python scripts/bench_bz_finisher.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.operators.kcore import _bz_finish_kernel

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3


def edge_block(max_part: int | None):
    """Symmetric co-occurrence edges, optionally restricted to parts <
    max_part (an induced subgraph — smaller but same degree shape)."""
    con = duckdb.connect()
    try:
        filt = (
            f"AND a.l_partkey < {max_part} AND b.l_partkey < {max_part}"
            if max_part
            else ""
        )
        return con.execute(
            "SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src, "
            "CAST(b.l_partkey AS BIGINT) AS dst "
            f"FROM read_parquet('{SF_DIR}/lineitem.parquet') a "
            f"JOIN read_parquet('{SF_DIR}/lineitem.parquet') b "
            "ON a.l_orderkey = b.l_orderkey "
            f"WHERE a.l_partkey <> b.l_partkey {filt}"
        ).df()
    finally:
        con.close()


def main() -> None:
    os.makedirs("BENCH", exist_ok=True)
    kern = _bz_finish_kernel(k_floor=0)
    rows = []
    for max_part in (5000, 10000, None):
        pdf = edge_block(max_part)
        secs = []
        for _ in range(PASSES):
            t = time.time()
            out = kern(pdf)
            secs.append(round(time.time() - t, 3))
        row = {
            "edges": int(len(pdf)),
            "vertices": int(out["id"].nunique()),
            "max_core": int(out["coreness"].max()),
            "secs_min": min(secs),
            "secs_all": secs,
            "edges_per_sec": round(len(pdf) / min(secs), 0),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("BENCH/bz_finisher.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
