"""Text analysis over the ``documents`` table — JVM-side where possible.

Everything a 100 TB training-data pipeline runs per document:
token counting, quality scoring, language ID, fingerprinting. The
first two are pure Column expressions (whole-stage codegen, zero
Python); language ID and fingerprinting are Arrow-batched pandas UDFs
(the reference's per-row compiled evaluators —
expressions/compilation/ExpressionCompiler.java — map to exactly this
split: Catalyst codegen when expressible, vectorized kernels when not).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType

# ---------- pure-Column (codegen) ----------

def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings.

    Kept deliberately SQL-parallel so the DuckDB oracle can reproduce
    it: length(trim(x)) = 0 -> 0 else size(split(trim(x), '\\s+')).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def word_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: words + standalone punctuation runs."""
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (words + punct).cast("long")


def quality_score(text_col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic, fully SQL-expressible.

    0.4·min(tokens/200, 1) + 0.3·(1 − punct_ratio) + 0.3·stopword_hit
    where stopword_hit is the fraction of {the,a,and,of,to} present.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = token_count(c).cast("double")
    len_term = F.least(toks / F.lit(200.0), F.lit(1.0))
    n_chars = F.length(c).cast("double")
    punct = (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))).cast("double")
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    low = F.lower(c)
    hits = sum(
        F.when(low.rlike(rf"\b{w}\b"), F.lit(1.0)).otherwise(F.lit(0.0))
        for w in ("the", "a", "and", "of", "to")
    )
    return (F.lit(0.4) * len_term + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.3) * hits / F.lit(5.0)).alias("quality")


# ---------- pandas-UDF kernels ----------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "这", "他"],
}


@F.pandas_udf(StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """Stopword-vote language ID; 'unk' when nothing matches.

    Vectorized: one str.count pass per (lang, stopword) over the whole
    Arrow batch — no per-row Python.
    """
    low = text.fillna("").str.lower()
    scores = np.zeros((len(low), len(_STOPWORDS)), dtype=np.int64)
    langs = list(_STOPWORDS)
    for j, lg in enumerate(langs):
        for w in _STOPWORDS[lg]:
            if lg == "zh":
                scores[:, j] += low.str.count(w).to_numpy()
            else:
                scores[:, j] += low.str.count(rf"\b{w}\b").to_numpy()
    best = scores.argmax(axis=1)
    out = np.array(langs, dtype=object)[best]
    out[scores.max(axis=1) == 0] = "unk"
    return pd.Series(out)


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_bytes(s: str) -> np.uint64:
    h = _FP_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return h


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((_fnv1a_bytes(t) for t in toks), dtype=np.uint64, count=len(toks))


@F.pandas_udf(LongType())
def doc_fingerprint(text: pd.Series) -> pd.Series:
    """Order-sensitive rolling polynomial hash of the token stream.

    fingerprint = Σ h(tok_i)·B^(n-1-i) mod 2^64 (FNV-1a token hashes,
    Horner evaluation) — a stable document identity robust to
    whitespace normalization, deterministic across runs/partitions.
    """
    out = np.empty(len(text), dtype=np.uint64)
    for i, t in enumerate(text.fillna("")):
        hs = _token_hashes(t)
        acc = np.uint64(0)
        for h in hs:
            acc = np.uint64((int(acc) * int(_FP_BASE) + int(h)) & 0xFFFFFFFFFFFFFFFF)
        out[i] = acc
    return pd.Series(out.astype(np.int64))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + [n_tokens, n_chars_calc, quality, lang_pred]."""
    return (
        docs.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_chars_calc", F.length(text_col).cast("long"))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(F.col(text_col)))
    )
