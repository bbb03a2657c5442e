"""Local replica of the driver's correctness gate: run each queries() entry
through Spark AND its oracle_sql() through DuckDB on the same parquet dir,
then compare row count, column names and the order-insensitive value
multiset.  Runs at sf0.001 in pytest (fast); scripts/check_parity.py runs
the same harness at sf0.01."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def normalize(rows, cols):
    """Sort columns by name, round floats, return sorted tuple list."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def compare_query(spark, name: str, sf_dir: str = SF_DIR):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = duck_run(sql, sf_dir)
    drows = [tuple(r) for r in ddf.itertuples(index=False)]
    dcols = list(ddf.columns)
    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    a = normalize(srows, scols)
    b = normalize(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, (name, mismatches[:5], f"{len(mismatches)} mismatched rows")


FAST = [
    "edges_cooccur", "degrees", "doc_sha", "token_stats", "dedup_exact",
    "events_hourly", "embed_topk", "triangles", "lcc", "kcore_h4",
]
ITERATIVE = [
    "pagerank_i8", "components", "components_smallstar", "kcore_exact", "kcore_peel",
    "bfs_from_min", "lpa_r2", "sssp_w7", "hits_i4", "pagerank_dangling_i6",
]


@pytest.mark.parametrize("name", FAST)
def test_parity_fast(spark, name):
    compare_query(spark, name)


@pytest.mark.parametrize("name", ITERATIVE)
def test_parity_iterative(spark, name):
    compare_query(spark, name)


def test_bfs_depth_cap_headroom(spark):
    """The recursive-CTE BFS oracle truncates at BFS_MAX_DEPTH; assert the
    benchmark graph's eccentricity from min(src) leaves 2x headroom so the
    oracle bound is validated rather than assumed (ADVICE r1)."""
    from pyspark.sql import functions as F

    q = entrymod.queries()["bfs_from_min"]
    ecc = q(spark, SF_DIR).agg(F.max("distance")).first()[0]
    assert ecc is not None and ecc <= entrymod.BFS_MAX_DEPTH / 2, (
        ecc,
        entrymod.BFS_MAX_DEPTH,
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["id", "rank", "degree"]


NEW_ORACLE = ["jaccard2_pairs", "lang_id", "louvain_p1",
              "edgelist_wdeg", "edgelist_symdeg", "quality_score",
              "tri_total", "events_stream", "louvain_full",
              "corpus_edges", "corpus_invariant", "corpus_pagerank",
              "minhash_pairs", "media_features", "pagerank_factored_i8",
              "events_user_totals",
              # round 5: staged-oracle + generator-expectation entries
              "simhash_pairs", "media_ppm_features", "media_resize",
              "ivf_topk", "embed_neardup", "random_walks_l3",
              "skipgram_w2", "ppr_i8", "ktruss_k12", "scc_corpus",
              "scc_dedges"]
ROWS_ONLY = ["lsh_topk",
             "lsh_recall", "minhash_recall", "simhash_recall",
             "ivf_recall", "reach2", "reach2_err",
             "embed_neardup_lsh", "embed_neardup_recall"]


def test_lsh_recall_meets_bar(spark):
    """ANN scale path: measured recall@3 vs the exact cosine top-k must be
    ≥ 0.9 at the fixed seed (VERDICT r1 item #10)."""
    row = entrymod.queries()["lsh_recall"](spark, SF_DIR).first()
    assert row["recall"] >= 0.9, row


def test_minhash_simhash_recall_meet_bar(spark):
    """Dedup quality gates (VERDICT r3 item #3): MinHash-LSH must recover
    ≥0.95 of the exact jaccard-0.8 pair set; SimHash chunk blocking is
    pigeonhole-exhaustive so its recall must be exactly 1.0."""
    mh = entrymod.queries()["minhash_recall"](spark, SF_DIR).first()
    assert mh["meets_bar"] and mh["recall"] >= 0.95, mh
    sh = entrymod.queries()["simhash_recall"](spark, SF_DIR).first()
    assert sh["meets_bar"] and sh["recall"] == 1.0, sh


@pytest.mark.parametrize("name", NEW_ORACLE)
def test_parity_functions(spark, name):
    compare_query(spark, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    # deterministic across two runs
    again = entrymod.queries()[name](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_sf01_suite_registered():
    """The benched-scale (sf0.1) gate entries: every _sf01 query has an
    oracle whose table source is the sf0.1 parquet by absolute path, and
    the suite covers the seven bench.py headline queries + louvain_full.
    The cells themselves run in scripts/check_parity.py and the driver
    sweep (too heavy for the unit suite)."""
    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    sf01 = sorted(k for k in qs if k.endswith("_sf01"))
    assert sf01 == [
        "bfs_sf01", "components_sf01", "degrees_sf01", "hits_i4_sf01",
        "kcore_peel_sf01", "louvain_full_sf01", "lpa_r2_sf01",
        "pagerank_i8_sf01", "sssp_w7_sf01", "triangles_sf01",
    ]
    for k in sf01:
        assert k in orc, k
        assert "read_parquet('" + entrymod.SF01_DIR in orc[k], k
        assert " lineitem" not in orc[k], k  # fully rebound, no sf0.01 view
