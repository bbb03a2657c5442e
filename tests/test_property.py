"""Property-based correctness: random adversarial edge lists (dupes,
self-loops, isolated-ish shapes, multi-component) through the engine vs the
independent NumPy oracles.  Complements the fixed fixtures — Hypothesis
explores graph shapes nobody thought to write down, with shrinking to a
minimal counterexample on failure.

Examples are deliberately few (Spark jobs cost ~1s each); the generator
space is what matters, not the count.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators import connected_components, kcore

from tests import oracles
from tests.conftest import edges_df

# up to 60 directed edge tuples over ≤14 vertices: dense enough for cores,
# small enough to shrink; duplicates and self-loops included on purpose
edge_lists = st.lists(
    st.tuples(st.integers(0, 13), st.integers(0, 13)),
    min_size=1,
    max_size=60,
)


def _clean(raw):
    """The engine's build semantics (drop self-loops, symmetrize, dedup)
    applied in plain Python — the oracle's input contract."""
    out = set()
    for a, b in raw:
        if a != b:
            out.add((a, b))
            out.add((b, a))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=edge_lists)
def test_components_random_graphs(spark, raw):
    edges = _clean(raw)
    if not edges:
        return
    g = LinkGraph.from_edges(edges_df(spark, raw), directed=False)
    got = {r["id"]: r["component"] for r in connected_components(g)[0].collect()}
    assert got == oracles.components(edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=edge_lists, mode=st.sampled_from(["hindex", "peel"]))
def test_kcore_random_graphs(spark, raw, mode):
    edges = _clean(raw)
    if not edges:
        return
    g = LinkGraph.from_edges(edges_df(spark, raw), directed=False)
    got = {r["id"]: r["coreness"] for r in kcore(g, mode=mode)[0].collect()}
    assert got == oracles.coreness(edges)
