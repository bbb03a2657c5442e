"""Derive a deterministic link graph from the driver's relational test
tables (TESTDATA.md).

The reference consumes text edge lists of social/web graphs
(``TCR/src/type/Graph.py:192-210``).  This sandbox ships TPC-H-ish parquet
instead, so the engine's benchmark graph is the **part co-occurrence graph**:
an undirected edge between two parts whenever some order contains both.
It is defined by a single self-join and is therefore expressible identically
in Spark and in the DuckDB oracle SQL — which is what makes every downstream
graph algorithm oracle-checkable by the driver.

Shape at sf0.01: ~2,000 vertices / ~180k directed (symmetric) edges, with
mild popularity skew — a dense community-free graph, ideal for exercising
the join+agg superstep path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import LinkGraph


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): distinct ordered part pairs co-occurring in an order.
    Symmetric by construction (both directions present), no self-loops.

    Equivalent oracle SQL::

        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey <> b.l_partkey
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()
    )


# parts are offset into their own id range so the order→part graph is a
# proper directed graph whose part vertices have NO out-edges (dangling).
# 2^40 sits far above any scale factor's orderkey range (TPC-H sparse
# orderkeys reach ~6M·SF — 1e9 would collide around SF ≈ 170 and silently
# merge order and part vertices); the DuckDB oracle CTE uses the same
# literal.
ORDER_PART_OFFSET = 1 << 40


def order_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): directed edge order → part for every lineitem row,
    deduped.  Parts never appear as sources, so every part vertex is
    dangling — the graph that exercises the reference's dangling-mass
    PageRank (``PageRankMatrix.py:50-61``) and gives HITS a genuinely
    bipartite hub/authority structure (hubs = orders, auths = parts).

    Equivalent oracle SQL::

        SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS src,
               CAST(l_partkey AS BIGINT) + 1099511627776 AS dst
        FROM lineitem
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + F.lit(ORDER_PART_OFFSET)).alias("dst"),
    ).distinct()


def cooccurrence_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """The co-occurrence LinkGraph, marked undirected (already symmetric,
    so ``from_edges`` symmetrization is a no-op dedup)."""
    e = cooccurrence_edges(spark, sf_dir)
    return LinkGraph(edges=e, directed=False)
