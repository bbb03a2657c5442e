"""Corpus-scale MinHash-LSH evidence (r6): run the banded near-dup path
on a ≥100k-document corpus and record the telemetry that proves the
"bucketed, never all-pairs" claim — candidate-pair count, bucket fan-out,
and wall — to BENCH/corpus_pipeline.jsonl.

Usage: python scripts/bench_dedup_scale.py [size]   (default "bench")
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
    spark = _session(cpus, "bench_dedup_scale")

    from pyspark.sql import functions as F

    from tcr_kcore_spark.functions.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from tcr_kcore_spark.sources import synth_corpus

    num_perm, bands, n = 64, 16, 3
    rows = num_perm // bands

    corpus = (
        synth_corpus(spark, size)
        .select(
            F.concat_ws("/", "repo", "path").alias("doc_id"),
            F.col("content").alias("text"),
        )
        .persist()
    )
    n_docs = corpus.count()

    t0 = time.time()
    sigs = minhash_signatures(corpus, num_perm, n, "doc_id", "text").persist()
    n_sigs = sigs.count()
    sig_secs = round(time.time() - t0, 2)

    band_keys = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    ).persist()
    # bucket fan-out telemetry: the candidate-join cost is Σ C(sz, 2) over
    # buckets — THE number that must stay ~linear in n_docs for the
    # "bucketed, never all-pairs" claim to hold at 10^12 docs
    t1 = time.time()
    b = band_keys.groupBy("band", "key").agg(F.count(F.lit(1)).alias("sz"))
    brow = b.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cand_multi"),
    ).first()
    cand = (
        band_keys.alias("x")
        .join(band_keys.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    n_cand = cand.count()
    cand_secs = round(time.time() - t1, 2)

    t2 = time.time()
    pairs = minhash_lsh_pairs(
        corpus, threshold=0.7, num_perm=num_perm, bands=bands, n=n,
        id_col="doc_id", text_col="text",
    )
    n_pairs = pairs.count()
    full_secs = round(time.time() - t2, 2)

    row = {
        "kind": "minhash_scale",
        "size": size,
        "docs": n_docs,
        "num_perm": num_perm,
        "bands": bands,
        "signature_secs": sig_secs,
        "buckets": int(brow["n_buckets"]),
        "buckets_max": int(brow["max_bucket"]),
        "candidate_multijoin_rows": int(brow["cand_multi"]),
        "candidates": n_cand,
        "candidates_per_doc": round(n_cand / max(n_docs, 1), 3),
        "candidate_secs": cand_secs,
        "verified_pairs": n_pairs,
        "full_pipeline_secs": full_secs,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus_pipeline.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
