"""Partitioning / skew-control plans (SURVEY.md §2.C)."""

from tcr_kcore_spark.plans.layout import locality_relabel, suggest_align_span
from tcr_kcore_spark.plans.partitioning import (
    broadcast_max_rows,
    degree_range_bounds,
    plan_superstep_edges,
    repartition_by_degree_mass,
    salted_count,
    salted_sum,
)

__all__ = [
    "broadcast_max_rows",
    "degree_range_bounds",
    "locality_relabel",
    "suggest_align_span",
    "plan_superstep_edges",
    "repartition_by_degree_mass",
    "salted_count",
    "salted_sum",
]
