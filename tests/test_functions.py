from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcr_kcore_spark.functions import (
    cosine_topk,
    exact_duplicates,
    language_id,
    lsh_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_pairs,
    token_count,
)


def _docs(spark):
    """Corpus with planted exact dups, near-dups and unrelated docs."""
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")  # one-token edit → high jaccard
    other = "completely different content about spark query engines and columnar execution at scale"
    rows = [
        (0, base),
        (1, base),              # exact dup of 0
        (2, near),              # near dup of 0
        (3, other),
        (4, "der hund und die katze sind nicht da und das ist gut"),
        (5, "le chat et le chien sont les amis est bon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    d = exact_duplicates(_docs(spark))
    rows = d.collect()
    assert len(rows) == 1
    assert rows[0]["n_copies"] == 2 and rows[0]["canonical_id"] == 0
    assert rows[0]["ids"] == [0, 1]


def test_ngram_jaccard_pairs(spark):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5   # near dup
    assert all(3 not in p for p in pairs)  # unrelated doc in no pair
    # python oracle for (0, 2)
    def sh(text, n=3):
        t = text.split()
        return {tuple(t[i:i+n]) for i in range(len(t)-n+1)}
    a, b = sh(_docs(spark).collect()[0]["text"]), sh(_docs(spark).collect()[2]["text"])
    want = len(a & b) / len(a | b)
    assert pairs[(0, 2)] == pytest.approx(want)


def test_ngram_jaccard_max_df_cap(spark):
    """Posting-list cap: boilerplate shared by every doc is dropped from
    the shingle space, so (a) pairs similar ONLY through boilerplate are
    not reported, and (b) planted near-dups — which share rare shingles —
    survive the cap with jaccard computed over the filtered space."""
    boiler = (
        "copyright two thousand twenty six all rights reserved licensed under "
        "the apache license version two point zero see the notice file"
    )
    tail_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tail_b = tail_a.replace("kappa", "lambda")  # near-dup of tail_a
    rows = [(0, f"{boiler} {tail_a}"), (1, f"{boiler} {tail_a}"), (2, f"{boiler} {tail_b}")]
    # 30 boilerplate-only docs with 2 unique trailing tokens each
    rows += [(10 + i, f"{boiler} unique{i} token{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=5).collect()
    }
    assert capped[(0, 1)] == 1.0                      # planted pair survives
    assert (0, 2) in capped and capped[(0, 2)] > 0.5  # near-dup survives
    assert all(a < 10 and b < 10 for a, b in capped), capped
    # sanity: WITHOUT the cap the boilerplate-only docs pair up (the
    # posting-list blowup the cap exists to prevent)
    uncapped = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=None).collect()
    }
    assert any(a >= 10 for a, _ in uncapped)


def test_minhash_lsh_finds_planted_pairs(spark):
    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all(3 not in p and 4 not in p and 5 not in p for p in got)


def test_simhash_pairs(spark):
    # the 4x16-bit chunk blocking GUARANTEES candidates only for hamming <= 3
    # (pigeonhole); the planted near-dup here sits at hamming 8 and may or
    # may not share a chunk — assert only the guaranteed contract
    got = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(_docs(spark), max_hamming=3).collect()}
    assert got.get((0, 1)) == 0            # identical text → identical simhash
    assert all(3 not in p for p in got)    # unrelated doc (hamming ~34) absent
    # with a generous verify threshold the near-dup appears iff blocked
    # together; chunk agreement for hamming-8 is possible but not guaranteed,
    # so only check that nothing below the threshold is missed for <=3


def test_token_count_and_quality(spark):
    tc = {r["doc_id"]: r for r in token_count(_docs(spark)).collect()}
    assert tc[0]["n_tokens"] == len(_docs(spark).collect()[0]["text"].split())
    q = {r["doc_id"]: r for r in quality_score(_docs(spark)).collect()}
    assert 0.0 <= q[0]["quality_score"] <= 1.0
    assert q[0]["stopword_ratio"] > 0


def test_language_id(spark):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(_docs(spark)).collect()}
    assert got[0] == "en"
    assert got[4] == "de"
    assert got[5] == "fr"


def _vectors(spark, n=40, dim=16, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    # make vec 1 a near-copy of vec 0
    base[1] = base[0] + 0.01 * rng.standard_normal(dim)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), base


def test_cosine_topk_exact(spark):
    import numpy as np

    df, base = _vectors(spark)
    got = cosine_topk(df, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q"], []).append((r["nbr"], r["sim"]))
    # numpy oracle for q=0
    sims = base @ base[0] / (np.linalg.norm(base, axis=1) * np.linalg.norm(base[0]))
    order = [i for i in np.argsort(-sims) if i != 0][:3]
    assert [n for n, _ in by_q[0]] == order
    assert by_q[0][0][0] == 1  # the planted near-copy is the top neighbor


def test_cosine_neardup_pairs_exact(spark):
    import numpy as np

    from tcr_kcore_spark.functions.similarity import cosine_neardup_pairs

    df, base = _vectors(spark)
    tau = 0.5
    got = {(r["a"], r["b"]): r["sim"] for r in cosine_neardup_pairs(df, tau).collect()}
    unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = unit @ unit.T
    want = {
        (a, b): round(float(sims[a, b]), 4)
        for a in range(len(base))
        for b in range(a + 1, len(base))
        if sims[a, b] >= tau
    }
    assert got == want
    assert (0, 1) in got  # the planted near-copy pair survives the filter


def test_lsh_neardup_subset_and_planted(spark):
    from tcr_kcore_spark.functions.similarity import (
        cosine_neardup_pairs,
        lsh_neardup_pairs,
    )

    df, _ = _vectors(spark)
    tau = 0.5
    exact = {(r["a"], r["b"]) for r in cosine_neardup_pairs(df, tau).collect()}
    approx = {(r["a"], r["b"]) for r in lsh_neardup_pairs(df, tau).collect()}
    # the final filter is exact, so LSH output must be a subset of exact
    assert approx <= exact
    # a cos≈0.9999 planted pair collides in some band w.p. ~1 at any seed
    assert (0, 1) in approx


def test_lsh_topk_recall(spark):
    df, _ = _vectors(spark)
    exact = {(r["q"], r["nbr"]) for r in cosine_topk(df, k=1).collect()}
    approx = {(r["q"], r["nbr"]) for r in lsh_topk(df, k=1, n_planes=16, bands=8).collect()}
    # with 8 bands of 2 bits, recall of rank-1 neighbors should be high
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # the planted near-pair must be found
    assert (0, 1) in approx


def test_ivf_topk_recall_and_planted(spark):
    from tcr_kcore_spark.functions.similarity import ivf_topk

    df, _ = _vectors(spark)
    exact = {(r["q"], r["nbr"]) for r in cosine_topk(df, k=1).collect()}
    approx = {(r["q"], r["nbr"])
              for r in ivf_topk(df, k=1, n_clusters=4, nprobe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # the cos≈0.9999 planted pair lands in the same inverted list
    assert (0, 1) in approx


def test_ivf_clustered_data_nprobe1_exact(spark):
    """Three well-separated planted clusters: the quantizer recovers them
    and nprobe=1 already gives perfect recall — the structured-corpus
    win case the random-embedding driver gate cannot show."""
    import numpy as np

    from tcr_kcore_spark.functions.similarity import ivf_topk

    rng = np.random.default_rng(3)
    centers = np.eye(3) * 10.0  # orthogonal, far apart
    rows = []
    for i in range(45):
        v = centers[i % 3] + 0.1 * rng.standard_normal(3)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["q"], r["nbr"]) for r in cosine_topk(df, k=2).collect()}
    approx = {(r["q"], r["nbr"])
              for r in ivf_topk(df, k=2, n_clusters=3, nprobe=1, lloyd_iters=3).collect()}
    assert approx == exact


def test_ivf_deterministic_and_no_dup_candidates(spark):
    from tcr_kcore_spark.functions.similarity import ivf_topk

    df, _ = _vectors(spark)
    a = sorted(map(tuple, ivf_topk(df, k=3, n_clusters=4, nprobe=2).collect()))
    b = sorted(map(tuple, ivf_topk(df, k=3, n_clusters=4, nprobe=2).collect()))
    assert a == b  # hash-seeded init + first-max ties → stable plan
    # inverted lists partition the corpus: no (q, nbr) appears twice
    pairs = [(q, n) for q, n, _ in a]
    assert len(pairs) == len(set(pairs))


def test_neighborhood_reach_exact_regime(spark):
    """Below 2^lg_k distinct values HLL sits in its sparse (exact) mode,
    so small-graph reach counts are exact — pins the hop semantics."""
    from tcr_kcore_spark.functions.sketches import neighborhood_reach
    from tcr_kcore_spark.graph import LinkGraph
    from tests.conftest import edges_df

    # path 0-1-2-3-4 (undirected): the 2-hop set includes the vertex
    # itself (v -> u -> v on a symmetric graph), so reach = 3/4/5/4/3
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    got = {r["id"]: r["reach"] for r in neighborhood_reach(g, hops=2).collect()}
    assert got == {0: 3, 1: 4, 2: 5, 3: 4, 4: 3}
    # hops=1 == exact out-degree
    got1 = {r["id"]: r["reach"] for r in neighborhood_reach(g, hops=1).collect()}
    assert got1 == {0: 1, 1: 2, 2: 2, 3: 2, 4: 1}
    # hops=3: end vertex reaches {self, 1, 2, 3}; middle reaches all 5
    got3 = {r["id"]: r["reach"] for r in neighborhood_reach(g, hops=3).collect()}
    assert got3[0] == 4 and got3[2] == 5


def test_neighborhood_reach_deterministic(spark):
    from tcr_kcore_spark.functions.sketches import neighborhood_reach
    from tcr_kcore_spark.graph import LinkGraph
    from tests.conftest import edges_df

    edges = [(i, (i * 7 + 3) % 50) for i in range(150)]
    g = LinkGraph.from_edges(edges_df(spark, edges), directed=False)
    a = sorted(map(tuple, neighborhood_reach(g, hops=2, lg_k=8).collect()))
    b = sorted(map(tuple, neighborhood_reach(g, hops=2, lg_k=8).collect()))
    assert a == b
