"""North_star input-shape bench: the (repo, path, commit, lang, content)
corpus through the FULL pipeline — sha256 fingerprint + vectorized import
extraction + dense ids + edge build, then PageRank to convergence (tol
1e-6) over the file-dependency graph.  Uses the deterministic synthetic
"bench" corpus (100 repos x 1000 files).  Fresh JVM; appends to
BENCH/corpus_pipeline.jsonl.

Usage: python scripts/bench_corpus.py [size]
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
    size = sys.argv[1] if len(sys.argv) > 1 else "bench"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus, "bench_corpus")

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators import pagerank
    from tcr_kcore_spark.sources import corpus_to_edges, synth_corpus
    from tcr_kcore_spark.superstep import release_state

    t0 = time.time()
    corpus = synth_corpus(spark, size).persist()
    n_files = corpus.count()
    gen_secs = round(time.time() - t0, 2)

    t = time.time()
    edges, ids = corpus_to_edges(corpus)
    n_edges = edges.count()
    ingest_secs = round(time.time() - t, 2)

    g = LinkGraph(edges, directed=True)
    t = time.time()
    pr, st = pagerank(g, tol=1e-6, max_iter=200, truncate_every=4)
    pr.count()
    pr_secs = round(time.time() - t, 2)

    # directed analytics: circular-import groups (SCC) on the same graph —
    # trim peels the acyclic bulk, coloring fixpoints settle the cycles
    from pyspark.sql import functions as F

    from tcr_kcore_spark.operators import scc

    t = time.time()
    labels, scc_st = scc(g)
    n_comp, n_multi = labels.agg(
        F.countDistinct("scc_id"),
        F.countDistinct(F.when(F.col("scc_id") != F.col("id"), F.col("scc_id"))),
    ).first()
    scc_secs = round(time.time() - t, 2)
    release_state(labels)

    # factored representation (A5/D15 counterpart): measure how much of
    # the import graph factors through shared out-sets, and the factored
    # PageRank cost on the same tolerance
    from tcr_kcore_spark.compress import compress_graph, pagerank_factored

    t = time.time()
    cg = compress_graph(g)
    compress_secs = round(time.time() - t, 2)
    t = time.time()
    prf, stf = pagerank_factored(cg, st.supersteps, truncate_every=4)
    prf.count()
    prf_secs = round(time.time() - t, 2)

    row = {
        "size": size,
        "files": n_files,
        "edges": n_edges,
        "gen_secs": gen_secs,
        "ingest_secs": ingest_secs,
        "pagerank_secs": pr_secs,
        "pagerank_supersteps": st.supersteps,
        "pagerank_converged": st.converged,
        "pagerank_edges_per_sec": round(st.supersteps * n_edges / pr_secs, 0),
        "scc_secs": scc_secs,
        "scc_outer_rounds": scc_st.outer_rounds,
        "scc_supersteps": scc_st.supersteps,
        "scc_components": n_comp,
        "scc_nontrivial": n_multi,
        "factored_ratio": round(cg.ratio, 4),
        "compress_secs": compress_secs,
        "pagerank_factored_secs": prf_secs,
    }
    print(json.dumps(row), flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus_pipeline.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    release_state(pr)
    release_state(prf)
    cg.unpersist()
    release_state(edges)
    release_state(ids)
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
