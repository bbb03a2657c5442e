"""Training-data pipeline functions: dedup, text analytics, similarity
search, multimodal plumbing."""

from tcr_kcore_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_64,
    simhash_pairs,
)
from tcr_kcore_spark.functions.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_index,
    ivf_probe,
    ivf_topk,
    lsh_neardup_pairs,
    lsh_topk,
)
from tcr_kcore_spark.functions.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    resize_media,
)
from tcr_kcore_spark.functions.sketches import neighborhood_reach
from tcr_kcore_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "exact_duplicates",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_64",
    "simhash_pairs",
    "cosine_neardup_pairs",
    "decode_and_featurize",
    "frame_sample_plan",
    "resize_media",
    "ivf_index",
    "ivf_probe",
    "ivf_topk",
    "lsh_neardup_pairs",
    "neighborhood_reach",
    "cosine_topk",
    "lsh_topk",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
