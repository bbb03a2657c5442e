"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline — a (queries × corpus)
  join with a JVM-side zip_with/aggregate dot product, ranked per query.
  Right answer at any scale where |queries|·|corpus| is affordable.
- LSH-bucketed top-k (random hyperplanes): the scale path — b deterministic
  hyperplane signs bucket the corpus; a query only scores candidates
  sharing ≥1 band, turning the cross join into a bucket join.  Recall is
  tunable via (n_planes, bands); exactness is NOT guaranteed (ANN).
- IVF top-k (inverted-file coarse quantizer): the other classic ANN scale
  path — spherical k-means partitions the corpus into inverted lists; a
  query scores only its nprobe nearest lists.  Recall tunable via nprobe.

Hyperplanes are generated deterministically from a seed with NumPy at plan
time (driver-side, tiny) and embedded as literal arrays — workers do pure
column math, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(qe, ne):
    dot = F.aggregate(F.zip_with(qe, ne, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nq = F.sqrt(F.aggregate(qe, F.lit(0.0), lambda a, x: a + x * x))
    nn = F.sqrt(F.aggregate(ne, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (nq * nn)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, nbr, sim): exact top-k cosine neighbors per query vector.
    ``queries`` defaults to all vectors (all-pairs top-k)."""
    corpus = vectors.select(
        F.col(id_col).alias("nbr"), F.col(vec_col).cast("array<double>").alias("ne")
    )
    qs = (queries or vectors).select(
        F.col(id_col).alias("q"), F.col(vec_col).cast("array<double>").alias("qe")
    )
    pairs = qs.crossJoin(corpus).where(F.col("q") != F.col("nbr"))
    sims = pairs.select("q", "nbr", _cos(F.col("qe"), F.col("ne")).alias("sim"))
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("nbr"))
    return sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _signature(vec_col, planes: list[list[float]]):
    """Array of sign bits (0/1) of <v, plane_i> as int column array."""
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, lit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(dot >= 0, 1).otherwise(0))
    return F.array(*bits)


def _unit(df: DataFrame, id_out: str, id_col: str, vec_col: str) -> DataFrame:
    """(id_out, u): vectors L2-normalized ONCE (n norm computations instead
    of n² inside the pair join — the pair expression reduces to a dot)."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        F.col(id_col).alias(id_out),
        F.transform(v, lambda x: x / norm).alias("u"),
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim): every unordered pair with cosine ≥ ``threshold`` —
    EXACT embedding-cosine near-duplicate detection, the fifth dedup
    modality beside exact-hash / MinHash / SimHash / n-gram Jaccard
    (tcr_kcore_spark/functions/dedup.py).

    This is the O(n²/2) baseline: a self-join on ``a < b`` over unit
    vectors with a JVM-side dot product (vectors are normalized once
    before the join, so the per-pair work is one zip_with/aggregate —
    no Python anywhere).  Right answer at any scale where n² pair
    evaluations are affordable (e.g. verifying one LSH bucket); the
    corpus-scale path is ``lsh_neardup_pairs``, which prunes the pair
    space to same-band candidates before this same exact filter."""
    left = _unit(vectors, "a", id_col, vec_col)
    right = _unit(vectors, "b", id_col, vec_col).select(
        "b", F.col("u").alias("ub")
    )
    pairs = left.join(right, F.col("a") < F.col("b"))
    dot = F.aggregate(
        F.zip_with("u", "ub", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.select("a", "b", dot.alias("s"))
        .where(F.col("s") >= threshold)
        .select("a", "b", F.round("s", 4).alias("sim"))
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim): approximate near-duplicate pairs — random-hyperplane
    LSH candidate generation followed by the exact cosine filter.

    Scale path for ``cosine_neardup_pairs``: only pairs sharing at least
    one of ``bands`` sign-bands are scored, turning the O(n²) self-join
    into per-bucket joins (shuffle on (band, key), skew bounded by bucket
    size).  Output ⊆ the exact pair set (the final filter is exact); a
    true pair is missed only if it collides in no band — for cosine s the
    per-band collision probability is (1 − arccos(s)/π)^(n_planes/bands),
    so recall rises steeply with s (measured by the ``embed_neardup_
    recall`` driver gate)."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    rows = n_planes // bands
    u = _unit(vectors, "a", id_col, vec_col)
    sig = _signature(F.col("u"), planes)
    keyed = u.withColumn("sig", sig).select(
        "a",
        "u",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",", *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    cand = keyed.join(
        keyed.select(F.col("a").alias("b"), F.col("u").alias("ub"), "band", "key"),
        ["band", "key"],
    ).where(F.col("a") < F.col("b"))
    dot = F.aggregate(
        F.zip_with("u", "ub", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # score THEN dedup: a pair colliding in j bands is scored j ≤ bands
    # times (cheap vectorized JVM dots, identical bits each time), so the
    # band-dedup becomes a HashAggregate over (a, b, s) scalars on the
    # pairs that PASS the filter — instead of a dropDuplicates that drags
    # both 64-dim vectors through a SortAggregate exchange per candidate
    # (arrays in the aggregation buffer force the sort-based fallback).
    return (
        cand.select("a", "b", dot.alias("s"))
        .where(F.col("s") >= threshold)
        .groupBy("a", "b")
        .agg(F.round(F.max("s"), 4).alias("sim"))
    )


def _argmax_centroid(u_col, cents: list[list[float]]):
    """0-based index of the centroid with the max dot product (first on
    ties — deterministic).  Centroids are plan-time literals: workers do
    K vectorized dots, no Python."""
    dots = [
        F.aggregate(
            F.zip_with(u_col, F.array(*[F.lit(float(x)) for x in c]), lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        for c in cents
    ]
    arr = F.array(*dots)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def _ivf_centroids(u: DataFrame, n_clusters: int, iters: int, seed: int) -> list[list[float]]:
    """Spherical k-means centroids, trained distributed, held driver-side
    (K·dim floats — always tiny).  Init is a deterministic uniform sample:
    the ``n_clusters`` vectors with the smallest ``xxhash64(id, seed)``.
    Each Lloyd round is one assignment scan (literal-centroid dots) plus
    one map-side-combinable (cluster, dim) sum — the standard distributed
    k-means update; only K·dim aggregated rows reach the driver."""
    init = (
        u.select("u", F.xxhash64(F.col("_ivf_id").cast("string"), F.lit(seed)).alias("h"))
        .orderBy("h", "_ivf_id")
        .limit(n_clusters)
        .collect()
    )
    cents = [list(r["u"]) for r in init]
    for _ in range(iters):
        got = (
            u.withColumn("c", _argmax_centroid(F.col("u"), cents))
            .select("c", F.posexplode("u").alias("pos", "val"))
            .groupBy("c", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in got:
            by_c.setdefault(r["c"], {})[r["pos"]] = r["s"]
        new = []
        for i, old in enumerate(cents):
            dims = by_c.get(i)
            if not dims:  # empty cluster keeps its centroid
                new.append(old)
                continue
            v = [dims[p] for p in range(len(old))]
            n = sum(x * x for x in v) ** 0.5 or 1.0
            new.append([x / n for x in v])  # re-normalize (spherical)
        cents = new
    return cents


def ivf_index(
    vectors: DataFrame,
    n_clusters: int = 8,
    lloyd_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Train the IVF coarse quantizer and assign every corpus vector to
    its inverted list.  Returns ``((nbr, ne, cl) cached DataFrame,
    centroids)`` — the centroids are K·dim driver-side floats, the
    assignment is one int column on the corpus."""
    u = _unit(vectors, "nbr", id_col, vec_col).withColumn("_ivf_id", F.col("nbr"))
    cents = _ivf_centroids(u, n_clusters, lloyd_iters, seed)
    corpus = (
        u.select("nbr", F.col("u").alias("ne"))
        .withColumn("cl", _argmax_centroid(F.col("ne"), cents))
        .persist()
    )
    return corpus, cents


def ivf_probe(
    queries: DataFrame,
    cents: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, qe, cl): each query paired with its ``nprobe`` closest
    inverted-list ids (literal-centroid dots, top-nprobe per query)."""
    qu = _unit(queries, "q", id_col, vec_col)
    qdots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "u", F.array(*[F.lit(float(x)) for x in c]), lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            for c in cents
        ]
    )
    probed = qu.select(
        "q", F.col("u").alias("qe"), F.posexplode(qdots).alias("cl", "cdot")
    )
    wq = Window.partitionBy("q").orderBy(F.desc("cdot"), F.asc("cl"))
    return (
        probed.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("q", "qe", "cl")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    lloyd_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, nbr, sim): approximate top-k via an IVF (inverted-file) index —
    the coarse-quantizer ANN variant beside ``lsh_topk``.

    Index: spherical k-means assigns every corpus vector to its nearest
    of ``n_clusters`` centroids (one int column — the inverted list key).
    Query: each query scores only the vectors in its ``nprobe`` closest
    clusters, turning the cross join into a join on the cluster id, with
    candidate fraction ≈ nprobe/n_clusters.  Clusters partition the
    corpus — each corpus vector lives in exactly one inverted list, so a
    (q, nbr) candidate arises at most once and no per-pair dedup is
    needed (unlike LSH bands).  Centroids are plan-time literal arrays —
    assignment and probing are pure JVM column math; recall is tunable
    via nprobe (measured by the ``ivf_recall`` driver gate).  At cluster
    scale the corpus shuffles once on the cluster id and each Lloyd round
    is one map-side-combinable aggregation."""
    corpus, cents = ivf_index(vectors, n_clusters, lloyd_iters, seed, id_col, vec_col)
    probed = ivf_probe(
        queries if queries is not None else vectors, cents, nprobe, id_col, vec_col
    )
    cand = probed.join(corpus, "cl").where(F.col("q") != F.col("nbr"))
    dot = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    sims = cand.select("q", "nbr", dot.alias("sim"))
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("nbr"))
    return sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q, nbr, sim): approximate top-k via random-hyperplane LSH.
    Candidates share at least one of ``bands`` sign-bands (n_planes/bands
    bits each); only candidates are scored."""
    rows = n_planes // bands
    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)

    def band_keys(df, idc):
        sig = _signature(F.col("v"), planes)
        d = df.select(
            F.col(id_col).alias(idc), F.col(vec_col).cast("array<double>").alias("v")
        ).withColumn("sig", sig)
        return d.select(
            idc,
            "v",
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[b * rows + r] for r in range(rows)]
                            ),
                            F.lit(b),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )

    corpus = band_keys(vectors, "nbr").persist()
    qs = band_keys(queries or vectors, "q")
    cand = (
        qs.join(
            corpus.select("nbr", F.col("v").alias("ne"), "band", "key"),
            ["band", "key"],
        )
        .where(F.col("q") != F.col("nbr"))
        .select("q", F.col("v").alias("qe"), "nbr", "ne")
    )
    # score THEN dedup (the lsh_neardup_pairs pattern, r6): a pair sharing
    # j bands is scored j ≤ bands times (identical cheap JVM dots), and the
    # dedup becomes a HashAggregate over (q, nbr, sim) scalars — the r5
    # dropDuplicates dragged both dim-length vectors through a shuffle per
    # candidate instead
    sims = (
        cand.select("q", "nbr", _cos(F.col("qe"), F.col("ne")).alias("sim"))
        .groupBy("q", "nbr")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("nbr"))
    out = sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")
    # the result is a lazy view over the persisted banded corpus — hand the
    # release handle to the caller (superstep.release_state frees it)
    from tcr_kcore_spark.superstep import propagate_release

    return propagate_release(out, corpus)
