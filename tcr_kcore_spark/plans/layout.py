"""Structure-aware vertex relabeling (graph reordering, SURVEY.md §2.C).

Blocked iterative kernels — the hybrid k-core peel's per-block BZ cascade,
or any contiguous-range CSR-block operator — win exactly when the id space
is laid out so most edges stay inside one vertex block (the measured
``stats.local_edge_frac``).  Real edge tables arrive with ids assigned by
ingest order: structurally adjacent vertices land in arbitrary blocks, the
in-block fraction collapses to ~1/n_blocks, and the adaptive peel correctly
falls back to its legacy one-level-per-shuffle-round regime
(``BENCH/peel_scale.jsonl`` scramble rows: frac 0.035, 143 global rounds).

``locality_relabel`` restores layout locality ONCE so every later blocked
run inherits it: order vertices by a structural key — connected component
by default, or any caller-provided clustering (LPA labels, repo/package
ids from the corpus ingest) via ``labels=`` — and renumber densely in that
order.  This is the distributed analog of the Gorder/RCM-style reordering
single-node engines apply before CSR builds; the reference's densification
sorts by raw vertex id only (``TCR/src/type/CSRGraph.py:432-441``), because
its GPU kernels are layout-insensitive — a Spark blocked kernel is not.

Scale notes (100 TB): the renumber is the distributed zipWithIndex pattern
(range partition on the key, per-partition running offsets, driver collect
of O(#partitions) counts — never a global single-partition window); the
edge rewrite is two hash joins against the V-row mapping — one-time cost
amortized over every subsequent query on the relabeled table, exactly like
the dense-id build it composes with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import EDGE_COLS, LinkGraph
from tcr_kcore_spark.superstep import SuperstepStats, truncate_lineage


def locality_relabel(
    graph: LinkGraph,
    labels: DataFrame | None = None,
    method: str = "components",
    n_parts: int | None = None,
) -> tuple[LinkGraph, DataFrame, SuperstepStats]:
    """Renumber vertices so structurally-close ones get contiguous ids.

    Returns ``(relabeled_graph, mapping(orig, id), stats)``; ``stats`` is
    the labeling run's telemetry (0 supersteps when ``labels`` is given).
    New ids are dense ``0..V-1`` ordered by ``(label, orig_id)`` — ties
    inside a cluster keep ingest order, so an already-local layout is
    preserved.  ``labels``: any ``(id, <key>)`` DataFrame; the key column
    may be numeric or string (e.g. the corpus repo name).  The mapping is
    materialized (lineage-truncated); release with
    ``superstep.release_state(mapping)`` when done.
    """
    spark = graph.edges.sparkSession
    stats = SuperstepStats()
    if labels is None:
        if method != "components":
            raise ValueError(f"unknown method {method!r}")
        from tcr_kcore_spark.operators.components import connected_components

        labels, stats = connected_components(graph)
        labels = labels.select("id", F.col("component").alias("lbl"))
    else:
        key_col = [c for c in labels.columns if c != "id"][0]
        labels = labels.select("id", F.col(key_col).alias("lbl"))

    nparts = int(n_parts or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keyed = labels.repartitionByRange(nparts, "lbl", "id").sortWithinPartitions(
        "lbl", "id"
    )
    lbl_type = keyed.schema["lbl"].dataType.simpleString()

    def _index_part(pit):
        # running offset ACROSS Arrow batches — a per-batch range() would
        # hand duplicate positions to every batch past the first
        start = 0
        for pdf in pit:
            pdf = pdf[["id", "lbl"]]
            pdf["pos"] = range(start, start + len(pdf))
            start += len(pdf)
            yield pdf

    counted = keyed.mapInPandas(
        _index_part, f"id long, lbl {lbl_type}, pos long"
    ).persist()  # pin partitioning so spark_partition_id is stable
    part_rows = (
        counted.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # min over the (lbl, id) TUPLE — independent per-column mins
            # would pair one partition's min lbl with another row's id
            F.min(F.struct("lbl", "id")).alias("lo"),
        )
        .collect()
    )
    stats.actions += 1
    acc = 0
    offsets = []
    for r in sorted(part_rows, key=lambda r: (r["lo"]["lbl"], r["lo"]["id"])):
        offsets.append((int(r["pid"]), acc))
        acc += r["n"]
    off_df = spark.createDataFrame(offsets, "pid int, off long")
    mapping = (
        counted.withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(off_df), "pid")
        .select(F.col("id").alias("orig"), (F.col("pos") + F.col("off")).alias("id"))
    )
    mapping = truncate_lineage(mapping)
    counted.unpersist()

    attrs = [c for c in graph.edges.columns if c not in EDGE_COLS]
    e = (
        graph.edges.join(
            mapping.select(F.col("orig").alias("src"), F.col("id").alias("_ns")),
            "src",
        )
        .join(
            mapping.select(F.col("orig").alias("dst"), F.col("id").alias("_nd")),
            "dst",
        )
        .select(F.col("_ns").alias("src"), F.col("_nd").alias("dst"), *attrs)
    )
    return LinkGraph(e, directed=graph.directed), mapping, stats
