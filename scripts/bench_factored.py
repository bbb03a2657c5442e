"""Factored-graph WIN case (VERDICT r4 ask #5): a sharing-heavy synthetic
import graph — many file vertices importing IDENTICAL library bundles, the
motivating shape compress.py documents — at ≥1M edges, measuring plain vs
factored PageRank wall at the same superstep count so ``ratio``'s fallback
threshold is calibrated by data.  (The corpus row in
BENCH/corpus_pipeline.jsonl is the LOSS case: ratio 0.9934, factored 3.6×
slower; this script records the other side.)

Graph: N files, L bundles of S libraries each (bundles disjoint).  File i
imports every library of bundle ``i % L`` and NOTHING else — the factoring
key is the WHOLE out-set, so any per-file extra edge would make every set
unique and factor nothing (the first cut of this script did exactly that:
ratio 1.0).  Each library instead gets one chain edge lib→next-lib — a
unique singleton out-set that stays in the direct table (non-empty direct
path, no dangling library vertices).  |E| = N·S + L·S; factored rows ≈
N(owners) + L·S(members) + L·S(direct) ⇒ ratio ≈ (N + 2·L·S)/((N+L)·S)
≈ 1/S for L·S ≪ N.

Built entirely with spark.range + JVM expressions (no driver-side rows).
Fresh JVM; appends to BENCH/corpus_pipeline.jsonl with kind=win_case.

Usage: python scripts/bench_factored.py [n_files] [libs_per_bundle] [bundles] [iters]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _session


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    s_libs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    l_bundles = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus, "bench_factored")

    from pyspark.sql import functions as F

    from tcr_kcore_spark.compress import compress_graph, pagerank_factored
    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators.pagerank import pagerank_fixed_iters
    from tcr_kcore_spark.superstep import release_state

    # vertex id layout: files [0, N), libraries [N, N + L*S)
    files = spark.range(n_files).select(F.col("id").alias("src"))
    bundle_members = spark.range(l_bundles * s_libs).select(
        (F.col("id") / s_libs).cast("long").alias("bundle"),
        (F.col("id") + n_files).alias("dst"),
    )
    imports = files.withColumn("bundle", F.pmod("src", F.lit(l_bundles))).join(
        bundle_members, "bundle"
    ).select("src", "dst")
    n_libs = l_bundles * s_libs
    lib_chain = spark.range(n_libs).select(
        (F.col("id") + n_files).alias("src"),
        (F.pmod(F.col("id") + 1, F.lit(n_libs)) + n_files).alias("dst"),
    )
    edges = imports.unionByName(lib_chain).persist()
    n_edges = edges.count()

    g = LinkGraph(edges, directed=True)
    t = time.time()
    pr = pagerank_fixed_iters(g, iters)
    pr.count()
    plain_secs = round(time.time() - t, 2)

    t = time.time()
    cg = compress_graph(g)
    compress_secs = round(time.time() - t, 2)
    t = time.time()
    prf, _ = pagerank_factored(cg, iters)
    prf.count()
    factored_secs = round(time.time() - t, 2)

    # same scores up to float regrouping (compress.py docstring contract)
    diff = (
        pr.withColumnRenamed("rank", "a")
        .join(prf.withColumnRenamed("rank", "b"), "id")
        .select(F.max(F.abs(F.col("a") - F.col("b"))).alias("d"))
        .first()["d"]
    )

    row = {
        "kind": "win_case",
        "files": n_files,
        "libs_per_bundle": s_libs,
        "bundles": l_bundles,
        "edges": n_edges,
        "iters": iters,
        "factored_ratio": round(cg.ratio, 4),
        "compress_secs": compress_secs,
        "pagerank_plain_secs": plain_secs,
        "pagerank_factored_secs": factored_secs,
        "speedup": round(plain_secs / factored_secs, 2),
        "max_abs_diff": float(diff),
    }
    print(json.dumps(row), flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus_pipeline.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    release_state(pr)
    release_state(prf)
    cg.unpersist()
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
