"""BPE trainer (functions/bpe.py) vs an independent pure-python
trainer implementing the same documented merge convention."""

from __future__ import annotations

import re

import numpy as np

from adopt_spark.functions.bpe import bpe_train


def _replace_passes(repr_: str, a: str, b: str, passes: int = 3) -> str:
    """Literal left-to-right non-overlapping replace, `passes` times —
    the module's documented merge-application convention."""
    pat, rep = f" {a} {b} ", f" {a}{b} "
    for _ in range(passes):
        repr_ = repr_.replace(pat, rep)
    return repr_


def py_bpe(texts: list[str], n_merges: int, passes: int = 3):
    from collections import Counter

    vocab = Counter(w for t in texts for w in t.split()
                    if re.fullmatch("[a-z]+", w))
    reprs = {w: " " + " ".join(w) + " " for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, f in vocab.items():
            syms = reprs[w].split()
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        reprs = {w: _replace_passes(r, a, b, passes)
                 for w, r in reprs.items()}
    return merges


def _run(spark, texts, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return [(r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in bpe_train(df, n_merges).orderBy("rank").collect()]


def test_bpe_vs_python_random_corpus(spark):
    rng = np.random.default_rng(21)
    words = ["spark", "shark", "sparse", "parse", "spar", "park",
             "hash", "shash", "mash", "partition", "part", "sharded"]
    texts = [" ".join(words[int(i)] for i in rng.integers(0, len(words), 30))
             for _ in range(40)]
    assert _run(spark, texts, 10) == py_bpe(texts, 10)


def test_bpe_learns_composed_symbols(spark):
    """'abab abab' style corpus: after (a,b) -> ab, the next merge
    must be the composed pair (ab, ab)."""
    texts = ["abab " * 20] * 5
    got = _run(spark, texts, 2)
    assert got[0][1:4] == ("a", "b", "ab")
    assert got[1][1:4] == ("ab", "ab", "abab")


def test_bpe_early_stop_when_exhausted(spark):
    """Single-char words have no adjacent pairs — trainer returns
    fewer merges than asked, not an error."""
    texts = ["a b c a b"] * 3
    assert _run(spark, texts, 5) == []


def test_bpe_filters_non_alpha(spark):
    texts = ["hello hello WORLD 123 he!lo", "hello hel"]
    got = _run(spark, texts, 3)
    want = py_bpe(texts, 3)
    assert got == want
    # every learned symbol is lowercase alpha
    assert all(re.fullmatch("[a-z]+", m[3]) for m in got)


def test_bpe_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bpe_train(df, 0)


def _py_encode(texts, merges, passes=3):
    out = {}
    for i, t in enumerate(texts):
        words = [w for w in t.split() if re.fullmatch("[a-z]+", w)]
        chars = sum(len(w) for w in words)
        toks = 0
        for w in words:
            r = " " + " ".join(w) + " "
            for _, a, b, _, _ in merges:
                r = _replace_passes(r, a, b, passes)
            toks += len(r.split())
        out[i] = (len(words), chars, toks)
    return out


def test_bpe_encode_vs_python(spark):
    from adopt_spark.functions.bpe import bpe_encode

    rng = np.random.default_rng(8)
    words = ["merge", "merging", "merged", "spark", "sparking", "park"]
    texts = [" ".join(words[int(i)]
                      for i in rng.integers(0, len(words), 25))
             for _ in range(20)] + ["", "  ", "ONLY UPPER 99"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges_df = bpe_train(df, 6)
    merges = [(r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
              for r in merges_df.orderBy("rank").collect()]
    got = {r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
           for r in bpe_encode(df, merges_df).collect()}
    want = _py_encode(texts, merges)
    assert got == want
    # docs with no alpha words report zeros, not missing rows
    assert got[len(texts) - 1] == (0, 0, 0)
    # BPE never produces MORE tokens than characters
    assert all(t <= c for _, c, t in got.values())


def test_bpe_fertility_rollup_law(spark):
    """Fertility per lang is exactly the per-doc counts rolled up."""
    from adopt_spark.functions.bpe import bpe_encode, bpe_train
    from adopt_spark.queries.registry import q_bpe_fertility  # noqa: F401
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enc = bpe_encode(docs, bpe_train(docs, n_merges=4))
    per_doc = {r.doc_id: r for r in enc.collect()}
    langs = {r.doc_id: r.lang
             for r in docs.select("doc_id", "lang").collect()}
    agg = {}
    for did, r in per_doc.items():
        a = agg.setdefault(langs[did], [0, 0, 0, 0])
        a[0] += 1
        a[1] += r.n_words
        a[2] += r.n_chars
        a[3] += r.n_bpe_tokens
    got = (enc.join(docs.select("doc_id", "lang"), "doc_id")
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_words").alias("w"),
                F.sum("n_chars").alias("c"),
                F.sum("n_bpe_tokens").alias("t")).collect())
    for r in got:
        assert [r.n_docs, r.w, r.c, r.t] == agg[r.lang]
        # BPE merges only ever shrink: tokens <= chars, >= words
        assert r.w <= r.t <= r.c
