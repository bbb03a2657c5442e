"""Algorithm operators (SURVEY.md §2.D): each is a function
``(LinkGraph, ...) -> DataFrame`` of per-vertex results, built on the
superstep driver."""

from tcr_kcore_spark.operators.bfs import bfs
from tcr_kcore_spark.operators.components import connected_components
from tcr_kcore_spark.operators.hits import hits
from tcr_kcore_spark.operators.kcore import kcore, kcore_hindex_rounds
from tcr_kcore_spark.operators.louvain import louvain, louvain_aggregate, louvain_phase1
from tcr_kcore_spark.operators.lpa import label_propagation
from tcr_kcore_spark.operators.pagerank import pagerank, personalized_pagerank
from tcr_kcore_spark.operators.scc import condensation, scc
from tcr_kcore_spark.operators.sssp import sssp
from tcr_kcore_spark.operators.triangles import (
    edge_support,
    ktruss,
    local_clustering_coefficient,
    triangle_count,
)
from tcr_kcore_spark.operators.walks import random_walks, skipgram_pairs

__all__ = [
    "bfs",
    "connected_components",
    "hits",
    "kcore",
    "kcore_hindex_rounds",
    "label_propagation",
    "louvain",
    "louvain_aggregate",
    "louvain_phase1",
    "pagerank",
    "personalized_pagerank",
    "random_walks",
    "skipgram_pairs",
    "edge_support",
    "ktruss",
    "scc",
    "condensation",
    "sssp",
    "triangle_count",
    "local_clustering_coefficient",
]
