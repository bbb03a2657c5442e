"""Deduplication operators for a 100 TB training-data pipeline.

All signature computation is JVM-side (xxhash64 / bit ops / aggregates) —
no Python in the hot path.  The LSH variants follow the standard
shingle → signature → band → bucket-join → verify pipeline: candidate
generation is a self-join on *band keys* (tiny, hash-partitioned), and only
candidates pay the exact-verification join.  At 10^12 documents the band
join is the only all-to-all step, and its key cardinality ≈ n_docs × bands,
uniformly hashed — no skew beyond true near-duplicate clusters.

- exact_duplicates: sha256 groupBy (one shuffle).
- ngram_jaccard_pairs: exact token/shingle Jaccard via an inverted-index
  join — the verification primitive and a standalone exact method.
- minhash_lsh_pairs: MinHash (num_perm seeds of xxhash64) + banded LSH.
- simhash_pairs: 64-bit SimHash + 4x16-bit chunk blocking, verify by
  hamming distance (bit_count(a XOR b)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcr_kcore_spark.functions.text import tokens


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(sha, n_copies, canonical_id, ids): groups of byte-identical docs."""
    return (
        df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("sha"))
        .groupBy("sha")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("id").alias("canonical_id"),
            F.sort_array(F.collect_list("id")).alias("ids"),
        )
        .where("n_copies > 1")
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh): distinct word n-gram shingles per document, shingle hashed
    to 64 bits (storage- and shuffle-friendly)."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) for all pairs with shingle-set Jaccard ≥ threshold,
    a < b, via an inverted-index join.

    The default (``max_df=None``) computes EXACT classic Jaccard; callers
    at web scale should opt into a document-frequency cap explicitly (the
    contract query passes ``JACCARD_MAX_DF``), because the cap changes the
    reported similarity space.

    ``max_df`` caps posting-list length: shingles occurring in more than
    ``max_df`` documents are dropped from the shingle space BEFORE the
    self-join (sizes and intersections both use the filtered space, so the
    reported jaccard is exact over that space).  Without the cap one
    boilerplate shingle shared by 10^6 documents fans the self-join out to
    10^12 pairs; with it the join is bounded by Σ df² ≤ max_df · Σ df.
    Near-duplicates share many low-frequency shingles, so they survive the
    cap (tested with planted pairs); a pair similar ONLY through
    above-cap boilerplate is reported with reduced (or no) similarity —
    the standard common-shingle cutoff trade-off, stated explicitly.
    ``max_df=None`` disables the cap (exact classic Jaccard)."""
    sh = _shingles(df, id_col, text_col, n)
    if max_df is not None:
        keep = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= max_df
        )
        sh = sh.join(keep.select("sh"), "sh", "left_semi")
    sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig: array<long>): MinHash signature — min over shingles of
    xxhash64(seed, shingle) per seed.  One groupBy with num_perm min()
    aggregates (single shuffle, map-side combined)."""
    sh = _shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(num_perm)
    ]
    sigs = sh.groupBy("id").agg(*aggs)
    return sigs.select("id", F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: bool = True,
) -> DataFrame:
    """(a, b, jaccard): near-duplicate pairs via banded MinHash-LSH.

    num_perm/bands give rows-per-band r = num_perm//bands; the usual
    S-curve puts the detection knee near (1/bands)^(1/r).  Candidates are
    pairs sharing ≥1 band bucket; with verify=True each candidate's exact
    shingle Jaccard is computed and filtered by ``threshold``."""
    rows = num_perm // bands
    sigs = minhash_signatures(df, num_perm, n, id_col, text_col).persist()
    band_keys = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    cand = (
        band_keys.alias("x")
        .join(band_keys.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    if not verify:
        return cand
    sh = _shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # intersection size via double join keyed on (doc, shingle)
    inter = (
        cand.join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "s"), "a")
        .join(
            sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "s"),
            ["b", "s"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash_64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over token hashes with frequency
    weights — bit i of the result is the sign of Σ_tokens cnt·(±1)."""
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.xxhash64("t"))
    )
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = bit_sums.select(
        "id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63)))
                .otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ]
        ).alias("simhash"),
    )
    return sim


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, hamming): pairs within ``max_hamming`` bits.  Blocking: split
    the 64-bit hash into 4 chunks of 16 bits; any pair within hamming ≤ 3
    must agree exactly on ≥1 chunk (pigeonhole), so candidates = pairs
    sharing a chunk value; verify with bit_count(a XOR b)."""
    sims = simhash_64(df, id_col, text_col).persist()
    chunks = sims.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk", "val"),
    )
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "val"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "a",
            "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
