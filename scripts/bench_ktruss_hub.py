"""k-truss hub evidence (r6): the id-ordered wedge join of r5 vs the
degree-ordered orientation, on the harness graph plus a planted low-id
hub (the pathological case: a canonical edge set where one minimal-id
vertex of degree d owns ~d²/2 wedge rows on a single join key).

Records wedge-row counts under both orders and the ktruss walls
(incremental vs full-recount) to BENCH/corpus_pipeline.jsonl.

Usage: python scripts/bench_ktruss_hub.py [hub_degree]
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
    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = _session(cpus, "bench_ktruss_hub")

    from pyspark.sql import functions as F

    from tcr_kcore_spark.graph import LinkGraph
    from tcr_kcore_spark.operators.triangles import ktruss
    from tcr_kcore_spark.sources.relational import cooccurrence_edges

    base = cooccurrence_edges(spark, sf_dir)
    # hub id 0 is (degree, id)-maximal under degree order but id-MINIMAL:
    # every canonical hub edge has a == 0, so the id-order wedge join keys
    # all of them on one value.  Spokes use a high id range (no collision).
    spokes = spark.range(hub_deg).select(
        F.lit(0).cast("long").alias("src"), (F.col("id") + 10_000_000).alias("dst")
    )
    hub_edges = spokes.unionByName(
        spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    g = LinkGraph(base.unionByName(hub_edges), directed=False)
    g.materialize()

    canon = (
        g.edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
        .persist()
    )
    n_edges = canon.count()

    # wedge-row counts: the quantity the r5 verdict flagged (deg² on the
    # hub key under id order; bounded by oriented out-degree under degree
    # order).  Counted with plain aggregations over the degree table — no
    # need to materialize the wedges themselves.
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # id order: per-vertex fan-out = #canonical edges with a == v
    id_fan = canon.groupBy("a").agg(F.count(F.lit(1)).alias("f"))
    wedges_id = id_fan.agg(F.sum(F.col("f") * (F.col("f") - 1) / 2)).first()[0]
    # degree order: fan-out = oriented out-degree under (degree, id)
    ed = canon.join(
        deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    deg_fan = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src")
    ).groupBy("src").agg(F.count(F.lit(1)).alias("f"))
    wedges_deg = deg_fan.agg(F.sum(F.col("f") * (F.col("f") - 1) / 2)).first()[0]
    max_id_fan = id_fan.agg(F.max("f")).first()[0]
    max_deg_fan = deg_fan.agg(F.max("f")).first()[0]

    # one untimed warmup run: the first ktruss in a fresh JVM pays codegen
    # and Python-worker startup (~3-6 s) that would bias whichever timed
    # variant runs first (measured both orders: the first run is ~1.5x)
    ktruss(g, 12)[0].count()

    t = time.time()
    cur, st = ktruss(g, 12)
    n_inc = cur.count()
    inc_secs = round(time.time() - t, 2)
    inc_rounds = st.supersteps

    os.environ["SPARK_GRAFT_KTRUSS_INCREMENTAL"] = "0"
    t = time.time()
    cur2, st2 = ktruss(g, 12)
    n_full = cur2.count()
    full_secs = round(time.time() - t, 2)
    del os.environ["SPARK_GRAFT_KTRUSS_INCREMENTAL"]
    assert n_inc == n_full, (n_inc, n_full)

    row = {
        "kind": "ktruss_hub",
        "sf_dir": sf_dir,
        "hub_degree": hub_deg,
        "canonical_edges": n_edges,
        "wedges_id_order": int(wedges_id),
        "wedges_degree_order": int(wedges_deg),
        "max_key_fanout_id_order": int(max_id_fan),
        "max_key_fanout_degree_order": int(max_deg_fan),
        "ktruss_incremental_secs": inc_secs,
        "ktruss_incremental_rounds": inc_rounds,
        "ktruss_full_recount_secs": full_secs,
        "ktruss_full_recount_rounds": st2.supersteps,
        "truss_edges": n_inc,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus_pipeline.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
