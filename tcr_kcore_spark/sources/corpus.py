"""Deterministic synthetic source-code corpus.

BASELINE.json's ``input_hint`` defines the engine's primary ingest input: a
table ``(repo string, path string, commit string, lang string,
content string)`` of source files whose import statements induce the link
graph.  No such data ships with the sandbox, so this module synthesizes it
deterministically (seed fixed, NumPy-vectorized, no wall clock) — sizes per
FIXTURES.md F1.

Import syntax is language-flavored but mechanically resolvable:

- python: ``from src.m{j} import handle`` (intra-repo) /
  ``import ext.{repo_slug}.m{j}`` (cross-repo)
- java:   ``import src.m{j};`` / ``import ext.{repo_slug}.m{j};``
- go:     ``import "src/m{j}"`` / ``import "ext/{repo_slug}/m{j}"``

where ``repo_slug = repo.replace('/', '_')`` and file ``j`` has path
``src/m{j}.{ext}``.  Import targets are Zipf-skewed so a few hub files are
imported by many others (exercises the skew/salting paths).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SIZES = {
    "tiny": (3, 20),  # repos, files per repo
    "small": (20, 100),
    "bench": (100, 1000),
}
LANGS = ["python", "java", "go"]
EXT = {"python": "py", "java": "java", "go": "go"}


def _import_line(lang: str, intra: bool, repo_slug: str, j: int) -> str:
    if lang == "python":
        return (
            f"from src.m{j} import handle"
            if intra
            else f"import ext.{repo_slug}.m{j}"
        )
    if lang == "java":
        return f"import src.m{j};" if intra else f"import ext.{repo_slug}.m{j};"
    return f'import "src/m{j}"' if intra else f'import "ext/{repo_slug}/m{j}"'


def synth_corpus_pdf(size: str = "small", seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (deterministic)."""
    n_repos, n_files = SIZES[size]
    rng = np.random.default_rng(seed)

    repos = [f"org{i % 7}/proj{i}" for i in range(n_repos)]
    rows = []
    # Zipf-ish popularity over file indices within a repo: file 0 is the hub
    pop = 1.0 / (np.arange(1, n_files + 1) ** 1.2)
    pop /= pop.sum()
    repo_pop = 1.0 / (np.arange(1, n_repos + 1) ** 1.2)
    repo_pop /= repo_pop.sum()

    for ri, repo in enumerate(repos):
        slug = repo.replace("/", "_")
        lang = LANGS[ri % len(LANGS)]
        ext = EXT[lang]
        commit = hashlib.sha256(f"{repo}@{seed}".encode()).hexdigest()[:40]
        n_imports = rng.integers(1, 6, size=n_files)
        for j in range(n_files):
            lines = [f"// module m{j} of {repo}" if lang != "python" else f"# module m{j} of {repo}"]
            # intra-repo imports (Zipf-skewed targets)
            targets = rng.choice(n_files, size=n_imports[j], p=pop)
            for t in sorted(set(int(t) for t in targets if t != j)):
                lines.append(_import_line(lang, True, slug, t))
            # occasional cross-repo import
            if rng.random() < 0.3 and n_repos > 1:
                other = int(rng.choice(n_repos, p=repo_pop))
                if other != ri:
                    oslug = repos[other].replace("/", "_")
                    tfile = int(rng.choice(n_files, p=pop))
                    lines.append(_import_line(lang, False, oslug, tfile))
            body = f"def handle():\n    return {j}\n" if lang == "python" else f"int handle() {{ return {j}; }}\n"
            lines.append(body)
            rows.append(
                (repo, f"src/m{j}.{ext}", commit, lang, "\n".join(lines))
            )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_corpus(spark: SparkSession, size: str = "small", seed: int = 42) -> DataFrame:
    """Corpus as a Spark DataFrame (Arrow path)."""
    pdf = synth_corpus_pdf(size, seed)
    return spark.createDataFrame(
        pdf, schema="repo string, path string, commit string, lang string, content string"
    )
