"""Import/dependency edge extraction — vectorized pandas UDF.

Input: the repo-file corpus (repo, path, commit, lang, content).
Output: repo→repo dependency edges. The parse is a per-language regex
over ``content``, executed as an Arrow-batched pandas UDF via
``mapInPandas`` (no per-row Python, per the input hint). The regexes
recognize the canonical import forms the corpus generator emits —
in a real deployment these would be the language ecosystems' resolver
rules; the Spark-side plumbing (schema, batching, explode, dedup)
is the part that must scale.

The reference's analogue is its CSV→typed-column loader + string
dictionary compressor (diskio/LoadCSV.java, compression/Compressor.java):
raw external bytes → a normalized integer-keyed relation.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# canonical target forms, per language (matching corpus._import_line)
_PATTERNS = {
    "python": re.compile(r"^import\s+(org\d+)\.(lib\d+)\s*$", re.M),
    "java": re.compile(r"^import\s+(org\d+)\.(lib\d+)\.Core;\s*$", re.M),
    "go": re.compile(r'^import\s+"github\.com/(org\d+)/(lib\d+)"\s*$', re.M),
    "js": re.compile(r"require\('@(org\d+)/(lib\d+)'\)", re.M),
}


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: content → one row per (file, import target).

    Vectorized per batch: group the batch by lang (≤4 groups), apply
    str.findall per group — pandas' C regex loop, not a Python
    row loop. Carries content_sha through so the per-row invariant is
    checkable on the extraction output.
    """
    for pdf in it:
        outs = []
        for lang, grp in pdf.groupby("lang"):
            pat = _PATTERNS.get(lang)
            if pat is None:
                continue
            hits = grp["content"].str.findall(pat)
            n = hits.str.len().to_numpy()
            if n.sum() == 0:
                continue
            rep = grp.loc[grp.index.repeat(n)]
            flat = [f"{org}/{lib}" for row in hits for (org, lib) in row]
            outs.append(
                pd.DataFrame(
                    {
                        "src_repo": rep["repo"].to_numpy(),
                        "dst_repo": flat,
                        "path": rep["path"].to_numpy(),
                        "content_sha": rep["content_sha"].to_numpy(),
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)


EXTRACT_SCHEMA = "src_repo string, dst_repo string, path string, content_sha string"


def extract_file_edges(corpus: DataFrame) -> DataFrame:
    """Per-file import rows: [src_repo, dst_repo, path, content_sha]."""
    cols = ["repo", "path", "lang", "content", "content_sha"]
    return corpus.select(*cols).mapInPandas(_extract_batch, schema=EXTRACT_SCHEMA)


def repo_edges(corpus: DataFrame) -> DataFrame:
    """Distinct repo→repo dependency edges: [src_repo, dst_repo].

    Dedup shuffles on both columns; self-imports dropped (a repo
    importing itself is not a graph edge).
    """
    fe = extract_file_edges(corpus)
    return (
        fe.select("src_repo", "dst_repo")
        .where(F.col("src_repo") != F.col("dst_repo"))
        .distinct()
    )
