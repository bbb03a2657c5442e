"""Partitioning / skew-control plans (SURVEY.md §2.C)."""

from tcr_kcore_spark.plans.partitioning import (
    degree_range_bounds,
    repartition_by_degree_mass,
    salted_count,
    salted_sum,
)

__all__ = [
    "degree_range_bounds",
    "repartition_by_degree_mass",
    "salted_count",
    "salted_sum",
]
