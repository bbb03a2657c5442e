"""spark-submit entrypoint for the engine (north_rule: "run via
spark-submit --py-files across multi-executor clusters").

The engine package ships as a zip via --py-files; this script only assumes
``tcr_kcore_spark`` is importable once the session exists.  Example:

    python -c "import shutil; shutil.make_archive('/tmp/tcr_kcore_spark', 'zip', '.', 'tcr_kcore_spark')"
    spark-submit --master local[4] --py-files /tmp/tcr_kcore_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.001 --algo pagerank

On a real cluster the same invocation takes --master yarn/k8s:// and
--num-executors N; the engine's plans are partitioning-parametric
(spark.sql.shuffle.partitions), nothing else changes.

Prints ONE JSON line: {"algo": ..., "rows": N, "supersteps": K, "sec": S}.
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "components", "kcore", "lpa", "scc"])
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"tcr_kcore_{args.algo}").getOrCreate()

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import (
        connected_components,
        kcore,
        label_propagation,
        pagerank,
    )
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    g = LinkGraph(cooccurrence_edges(spark, args.sf_dir), directed=False)
    g.materialize()
    t = time.time()
    if args.algo == "pagerank":
        out, st = pagerank(g, tol=args.tol, max_iter=100)
        steps = st.supersteps
    elif args.algo == "components":
        out, st = connected_components(g, mode="hashmin")
        steps = st.supersteps
    elif args.algo == "kcore":
        out, st = kcore(g, mode="hindex")
        steps = st.supersteps
    elif args.algo == "scc":
        from tcr_kcore_spark.operators import scc as scc_op

        out, st = scc_op(LinkGraph(g.edges, directed=True))
        steps = st.supersteps
    else:
        out, st = label_propagation(g, rounds=2)
        steps = st.supersteps
    n = out.count()
    print(
        json.dumps(
            {
                "algo": args.algo,
                "rows": n,
                "supersteps": steps,
                "sec": round(time.time() - t, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
