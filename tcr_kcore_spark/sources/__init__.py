"""Graph sources: relational-derived edges, the synthetic code corpus, and
the import-extraction ingest pipeline."""

from tcr_kcore_spark.sources.corpus import synth_corpus
from tcr_kcore_spark.sources.edgelist import read_edgelist
from tcr_kcore_spark.sources.ingest import corpus_to_edges, sha256_invariant_check
from tcr_kcore_spark.sources.relational import (
    cooccurrence_edges,
    load_table,
    order_part_edges,
)

__all__ = [
    "synth_corpus",
    "read_edgelist",
    "corpus_to_edges",
    "sha256_invariant_check",
    "cooccurrence_edges",
    "load_table",
    "order_part_edges",
]
