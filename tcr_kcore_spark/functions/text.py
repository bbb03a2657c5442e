"""Text analytics over a documents table — all JVM-side column expressions
(regexp_extract_all / aggregate / transform), no Python UDFs.

These are the text-side operators a 100 TB training-data pipeline needs on
top of the link-graph engine (task-sheet mandate): token counting, quality
scoring, language ID, document fingerprinting.  Everything is a narrow
projection over one scan — Catalyst prunes to (id, text) at the reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
# tiny per-language stopword profiles for the n-gram/stopword heuristic —
# the classic cheap language-ID signal (counts, not ML)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "it": ["il", "di", "che", "la", "per", "non"],
}


def tokens(col: str = "text") -> Column:
    return F.regexp_extract_all(F.col(col), F.lit(TOKEN_RE), F.lit(0))


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars): whitespace tokenization + a BPE-ish subword
    proxy (count of 4-char windows) for budget estimation."""
    return df.select(
        id_col,
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        # crude byte-pair proxy: ceil(chars_without_spaces / 4)
        F.ceil(
            F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / 4.0
        ).cast("long").alias("n_subword_est"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a combined score in [0, 1]: length,
    mean token length, punctuation/digit density, stopword ratio.  The exact
    weighting is a placeholder policy; the shape (one projection, no UDF,
    no shuffle) is the point."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    ).cast("double")
    punct = F.length(
        F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")
    ).cast("double")
    digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")).cast("double")
    mean_tok_len = F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / n_tok
    stop_ratio = stop / n_tok
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    digit_ratio = digit / F.greatest(n_chars, F.lit(1.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    tok_len_ok = F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12), 1.0).otherwise(0.5)
    score = (
        0.4 * len_ok
        + 0.2 * tok_len_ok
        + 0.2 * (1.0 - F.least(punct_ratio * 5, F.lit(1.0)))
        + 0.1 * (1.0 - F.least(digit_ratio * 5, F.lit(1.0)))
        + 0.1 * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score each language by its profile-word
    hit rate; predict the argmax (ties → lexicographic).  One projection +
    one greatest() — no shuffle, no UDF."""
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("double") / n_tok
        for lang, words in LANG_PROFILES.items()
    }
    # argmax via chained when() over a stable language order
    langs = sorted(scores)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.select(
        id_col,
        best.alias("lang_pred"),
        F.round(best_score, 6).alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: full-content sha256 (the engine's
    ingest invariant) + a 64-bit rolling xxhash64 per 64-char block, combined
    order-sensitively — cheap near-identity check for shifted content."""
    blocks = F.transform(
        F.sequence(F.lit(0), F.floor(F.length(text_col) / 64).cast("int")),
        lambda i: F.xxhash64(F.col(text_col).substr(i * 64 + 1, F.lit(64)), i),
    )
    combined = F.aggregate(
        blocks, F.lit(0).cast("long"), lambda acc, x: acc * F.lit(31) + x
    )
    return df.select(
        id_col,
        F.sha2(F.col(text_col), 256).alias("sha256"),
        combined.alias("block_fingerprint"),
    )
