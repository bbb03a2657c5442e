"""random_walks: deterministic md5-choice walk sampling (operators/walks.py)."""

from __future__ import annotations

import hashlib

from tcr_kcore_spark.graph import LinkGraph
from tcr_kcore_spark.operators.walks import random_walks
from tests.conftest import edges_df


def _py_walks(
    adj: dict[int, list[int]], length: int, W: int, seed: int, verts=None
):
    """Independent Python simulation: neighbors in sorted order, choice =
    int(md5(f"{walk_id}:{step}:{seed}")[:8], 16) % deg.  ``verts`` defaults
    to the adjacency keys; pass the full vertex set for directed graphs
    where sinks start walks too."""
    rows = []
    for v in sorted(verts if verts is not None else adj):
        for r in range(W):
            wid, cur = v * W + r, v
            rows.append((wid, 0, cur))
            for step in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = int(
                    hashlib.md5(f"{wid}:{step}:{seed}".encode()).hexdigest()[:8], 16
                )
                cur = sorted(nbrs)[h % len(nbrs)]
                rows.append((wid, step, cur))
    return sorted(rows)


def _adj(edges, directed):
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        if not directed:
            adj.setdefault(b, []).append(a)
    return adj


def test_walks_match_python_oracle(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got, stats = random_walks(g, length=5, walks_per_vertex=2, seed=7)
    want = _py_walks(_adj(edges, directed=False), 5, 2, 7)
    assert sorted(map(tuple, got.collect())) == want
    assert stats.supersteps == 5


def test_walks_deterministic(spark):
    edges = [(i, (i * 3 + 1) % 20) for i in range(40)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    a, _ = random_walks(g, length=4, seed=1)
    b, _ = random_walks(g, length=4, seed=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_walks_stop_at_sinks(spark):
    # directed path 0 -> 1 -> 2: walks from 2 emit only step 0; from 1,
    # steps 0-1; from 0 the full length is reachable but the walk parks
    # at the sink and stops
    edges = [(0, 1), (1, 2)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=True)
    got, _ = random_walks(g, length=3, seed=0)
    rows = sorted(map(tuple, got.collect()))
    want = _py_walks(_adj(edges, directed=True), 3, 1, 0, verts={0, 1, 2})
    assert rows == want
    by_wid = {}
    for wid, step, _v in rows:
        by_wid[wid] = max(by_wid.get(wid, 0), step)
    assert by_wid == {0: 2, 1: 1, 2: 0}


def test_skipgram_pairs_python_oracle(spark):
    from collections import Counter

    from tcr_kcore_spark.operators.walks import skipgram_pairs

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    walks, _ = random_walks(g, length=4, seed=3)
    got = {(r["center"], r["context"]): r["cnt"]
           for r in skipgram_pairs(walks, window=2).collect()}
    rows = _py_walks(_adj(edges, directed=False), 4, 1, 3)
    by_wid = {}
    for wid, step, v in rows:
        by_wid.setdefault(wid, []).append((step, v))
    want = Counter()
    for seq in by_wid.values():
        for si, c in seq:
            for sj, x in seq:
                if si != sj and abs(si - sj) <= 2:
                    want[(c, x)] += 1
    assert got == dict(want)


def test_neighbor_index_hub_spans_partitions(spark):
    """A 500-neighbor hub range-partitioned into 8 parts must still number
    its neighbors 0..499 in dst order (the boundary-carry path), alongside
    small srcs whose numbering is local to one partition."""
    from tcr_kcore_spark.operators.walks import neighbor_index
    from tcr_kcore_spark.superstep import release_state
    from tests.conftest import edges_df

    edges = [(7, d) for d in range(500)] + [(3, 901), (3, 902), (950, 1), (950, 5)]
    idx = neighbor_index(edges_df(spark, edges), n_parts=8)
    rows = {(r["src"], r["dst"]): r["i"] for r in idx.collect()}
    assert len(rows) == len(edges)
    for d in range(500):
        assert rows[(7, d)] == d
    assert rows[(3, 901)] == 0 and rows[(3, 902)] == 1
    assert rows[(950, 1)] == 0 and rows[(950, 5)] == 1
    release_state(idx)
