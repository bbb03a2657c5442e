"""read_edgelist (reference A1, ``TCR/src/type/Graph.py:192-210``): comment
lines, extra attribute columns, self-loop/dup handling, densification."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.sources import read_edgelist

SNAP_FILE = """\
# Directed graph (each unordered pair of nodes is saved once)
# FromNodeId\tToNodeId
10 30
10 50
30 50
50 10
70 70
10 30
"""

WEIGHTED_FILE = """\
# src dst weight attr2
1 2 0.5 9
2 3 1.5 8
1 2 0.25 7
"""


def test_read_edgelist_snap_style(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(SNAP_FILE)
    g = read_edgelist(spark, str(p), directed=True)
    edges = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    # self-loop (70,70) dropped, duplicate (10,30) deduped
    assert edges == [(10, 30), (10, 50), (30, 50), (50, 10)]


def test_read_edgelist_densify(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(SNAP_FILE)
    dense, id_map = read_edgelist(spark, str(p), directed=False, densify=True)
    m = {r["orig"]: r["id"] for r in id_map.collect()}
    # ascending original-id order: 10->0, 30->1, 50->2 (70 only self-loops,
    # dropped before the vertex set forms)
    assert m == {10: 0, 30: 1, 50: 2}
    edges = {(r["src"], r["dst"]) for r in dense.edges.collect()}
    assert (0, 1) in edges and (1, 0) in edges  # symmetrized
    assert all(s != d for s, d in edges)


def test_read_edgelist_attrs(spark, tmp_path):
    p = tmp_path / "w.txt"
    p.write_text(WEIGHTED_FILE)
    g = read_edgelist(spark, str(p), directed=True)
    assert g.edges.columns == ["src", "dst", "weight", "attr2"]
    rows = {(r["src"], r["dst"]): (r["weight"], r["attr2"]) for r in g.edges.collect()}
    # duplicate (1,2): per-column MIN tie-break
    assert rows == {(1, 2): (0.25, 7.0), (2, 3): (1.5, 8.0)}


def test_probe_rows_bounded_width_autodetect(spark, tmp_path):
    """probe_rows bounds the autodetect scan to the first N data lines:
    uniform-width files detect the same n_attrs as the full scan; a ragged
    line BEYOND the probe window is (by documented trade-off) no longer a
    loud error — short lines yield nulls, long lines ignore extras."""
    p = tmp_path / "probe.txt"
    p.write_text("# hdr\n1 2 0.5\n2 3 1.5\n3 4\n")  # ragged at line 3
    # full-scan autodetect fails loudly
    import pytest

    with pytest.raises(ValueError, match="ragged"):
        read_edgelist(spark, str(p))
    # bounded probe sees only the uniform prefix -> weight column detected,
    # the short line's weight is null
    g = read_edgelist(spark, str(p), probe_rows=2)
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows[(1, 2)] == 0.5 and rows[(2, 3)] == 1.5
    assert (3, 4) in rows and rows[(3, 4)] is None
