from __future__ import annotations

from pyspark.sql import functions as F

from tcr_kcore_spark.sources.corpus import synth_corpus, synth_corpus_pdf
from tcr_kcore_spark.sources.ingest import (
    corpus_to_edges,
    extract_imports,
    file_table,
    fingerprint,
    sha256_invariant_check,
)


def test_corpus_deterministic():
    a = synth_corpus_pdf("tiny", seed=42)
    b = synth_corpus_pdf("tiny", seed=42)
    assert a.equals(b)
    assert set(a.columns) == {"repo", "path", "commit", "lang", "content"}
    assert len(a) == 60  # 3 repos x 20 files
    assert set(a["lang"]) == {"python", "java", "go"}


def test_sha256_invariant(spark):
    corpus = synth_corpus(spark, "tiny")
    files = file_table(corpus)
    assert sha256_invariant_check(corpus, files) == 0
    # a tampered row must be caught
    tampered = files.withColumn(
        "sha256",
        F.when(F.col("path") == "src/m0.py", F.lit("deadbeef")).otherwise(
            F.col("sha256")
        ),
    )
    assert sha256_invariant_check(corpus, tampered) > 0


def test_extract_imports_all_langs(spark):
    corpus = synth_corpus(spark, "tiny")
    imp = extract_imports(corpus)
    kinds = {r["kind"] for r in imp.select("kind").distinct().collect()}
    assert "intra" in kinds
    # every lang contributes intra imports
    by_lang = (
        imp.join(corpus.select("repo", "path", "lang"), ["repo", "path"])
        .groupBy("lang")
        .count()
        .collect()
    )
    assert {r["lang"] for r in by_lang} == {"python", "java", "go"}


def test_corpus_to_edges(spark):
    corpus = synth_corpus(spark, "tiny")
    edges, ids = corpus_to_edges(corpus)
    e = edges.collect()
    assert len(e) > 30
    # dense ids cover 0..V-1
    id_rows = sorted(r["id"] for r in ids.collect())
    assert id_rows == list(range(60))
    # no self loops
    assert all(r["src"] != r["dst"] for r in e)
    # hub effect: file m0 of each repo is a popular import target
    m0_ids = {r["id"] for r in ids.where("path like 'src/m0.%'").collect()}
    indeg = {}
    for r in e:
        indeg[r["dst"]] = indeg.get(r["dst"], 0) + 1
    top = sorted(indeg, key=indeg.get, reverse=True)[:6]
    assert m0_ids & set(top)
