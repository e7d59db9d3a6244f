"""Deterministic synthetic repo-file corpus (north-rule input shape).

Schema (BASELINE.json input_hint / FIXTURES.md §1):
    repos(repo string, path string, commit string, lang string,
          content string)

``content`` embeds import statements referencing other repos by
canonical name in per-language syntax; the generator *records* the
intended edge set, so extraction (extract.py) is tested against the
generator's own truth rather than re-derived.

Determinism: generated entirely from a seeded numpy Generator on the
driver, then parallelized — identical bytes at any parallelism level,
which is what makes the per-row sha256(content) invariant stable
(north rule). At true 10^12-file scale generation would itself be a
Spark job seeded per-partition (rng = default_rng(seed + pid)); the
driver-side path keeps small-scale tests exactly reproducible.

Skew by construction: import targets are Zipf-distributed over the
repo index (α configurable) plus explicit hub repos that a large
fraction of files import — exercising the salting/AQE-skew paths.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ("python", "java", "go", "js")


def _canonical(repo: str) -> str:
    """org12/lib7 → org12.lib7 (the module token embedded in content)."""
    return repo.replace("/", ".")


def _import_line(lang: str, target_repo: str) -> str:
    mod = _canonical(target_repo)
    org, lib = target_repo.split("/")
    if lang == "python":
        return f"import {mod}"
    if lang == "java":
        return f"import {mod}.Core;"
    if lang == "go":
        return f'import "github.com/{org}/{lib}"'
    if lang == "js":
        return f"const {lib}_{org} = require('@{org}/{lib}');"
    raise ValueError(lang)


_FILLER = {
    "python": "def fn_{i}(x):\n    return x * {i}\n",
    "java": "public int fn{i}(int x) {{ return x * {i}; }}\n",
    "go": "func Fn{i}(x int) int {{ return x * {i} }}\n",
    "js": "function fn{i}(x) {{ return x * {i}; }}\n",
}


@dataclass
class Corpus:
    files: pd.DataFrame        # repo, path, commit, lang, content
    expected_edges: pd.DataFrame  # src_repo, dst_repo (distinct)


def generate_corpus(
    n_repos: int = 20,
    n_files: int = 200,
    seed: int = 42,
    zipf_alpha: float = 2.0,
    n_hubs: int = 2,
    hub_prob: float = 0.3,
    max_imports: int = 6,
) -> Corpus:
    """Build the corpus + its ground-truth edge list in pandas."""
    rng = np.random.default_rng(seed)
    repos = [f"org{i // 4}/lib{i}" for i in range(n_repos)]
    file_repo = rng.integers(0, n_repos, size=n_files)
    file_lang = rng.integers(0, len(LANGS), size=n_files)

    rows = []
    edge_set: set[tuple[str, str]] = set()
    for f in range(n_files):
        r = int(file_repo[f])
        repo = repos[r]
        lang = LANGS[int(file_lang[f])]
        k = int(rng.integers(0, max_imports + 1))
        targets: set[int] = set()
        for _ in range(k):
            if n_hubs and rng.random() < hub_prob:
                t = int(rng.integers(0, n_hubs))          # hub repos = lowest ids
            else:
                # Zipf over repo index, clipped into range
                t = int(min(rng.zipf(zipf_alpha) - 1, n_repos - 1))
            if t != r:
                targets.add(t)
        imports = sorted(_import_line(lang, repos[t]) for t in targets)
        n_fill = int(rng.integers(1, 5))
        filler = "".join(
            _FILLER[lang].format(i=int(rng.integers(0, 1000))) for _ in range(n_fill)
        )
        content = "\n".join(imports) + ("\n" if imports else "") + filler
        commit = hashlib.sha1(f"{seed}:{repo}:{f}".encode()).hexdigest()
        rows.append(
            {
                "repo": repo,
                "path": f"src/mod_{f:05d}.{ {'python':'py','java':'java','go':'go','js':'js'}[lang] }",
                "commit": commit,
                "lang": lang,
                "content": content,
            }
        )
        for t in targets:
            edge_set.add((repo, repos[t]))

    files = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    edges = pd.DataFrame(sorted(edge_set), columns=["src_repo", "dst_repo"])
    return Corpus(files=files, expected_edges=edges)


def corpus_df(spark: SparkSession, corpus: Corpus,
              num_partitions: int | None = None) -> DataFrame:
    """Corpus as a Spark DataFrame (Arrow-converted), with sha256 col.

    The sha256(content) column is the per-row invariant the north rule
    tracks between source and every downstream materialization.
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        corpus.files, schema="repo string, path string, commit string, lang string, content string"
    )
    if num_partitions:
        df = df.repartition(num_partitions, "repo")
    return df.withColumn("content_sha", F.sha2(F.col("content"), 256))
