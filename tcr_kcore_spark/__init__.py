"""tcr_kcore_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference TCR-KCore engine (a
PowerGraph-style Gather-Apply-Scatter framework on GPU tensors plus CUDA /
OpenMP k-core decomposition — see SURVEY.md) as idiomatic Spark:

- the graph is an edge DataFrame ``(src long, dst long)`` plus per-algorithm
  vertex-state DataFrames (reference: CSR/CSC tensors,
  ``TCR/src/type/CSRGraph.py``),
- one GAS superstep = join (gather) -> groupBy aggregation (sum) -> join +
  conditional projection (apply) -> distinct projection (scatter/frontier),
  driven by a driver-side loop with persist/checkpoint/resume
  (reference: ``TCR/src/framework/GASProgram.py`` +
  ``TCR/src/framework/strategy/SimpleStrategy.py``),
- partitioning / skew handling is explicit (degree-quantile range bounds,
  hub salting) instead of the reference's LPT/Gemini partitioners
  (``TCR/src/framework/partition/``).

Nothing here is a port: no reference code is copied; semantics are
reproduced from the behaviors documented in SURVEY.md.
"""

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.session import get_spark

__all__ = ["LinkGraph", "get_spark"]
__version__ = "0.1.0"
