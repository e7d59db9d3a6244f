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
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import StringType

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


def _fnv1a_flat(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a of every token at once, tokens given as a flat uint8
    buffer + per-token byte lengths — vectorized over tokens.

    The byte loop runs over COLUMNS of a ragged byte matrix (one
    vectorized step per byte position, bounded by the longest token),
    not over rows: h = (h ^ byte) * B per position, uint64 wraparound
    is numpy's native modular arithmetic.
    """
    n = len(lens)
    h = np.full(n, _FP_OFFSET, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return h
    starts = np.cumsum(lens) - lens
    # Gather column j directly from the flat buffer (flat[starts+j] for
    # tokens long enough) — O(total_bytes + n·passes) and NO dense
    # (n × longest-token) matrix, which would blow up on a batch mixing
    # many short tokens with one enormous one (embedded blobs).
    for j in range(int(lens.max())):
        active = lens > j
        idx = starts[active] + j
        h[active] = (h[active] ^ flat[idx].astype(np.uint64)) * _FP_BASE
    return h


def _fnv1a_batch(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a of a list of byte strings (test/utility entry point)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    flat = (np.frombuffer(b"".join(tokens), dtype=np.uint8)
            if lens.sum() else np.empty(0, np.uint8))
    return _fnv1a_flat(flat, lens)


def _token_hashes(text: str) -> np.ndarray:
    """FNV-1a per whitespace token (simhash's bit-vote input); the
    per-token byte loop runs in the vectorized column-wise kernel."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return _fnv1a_batch([t.encode("utf-8") for t in toks])


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive 64-bit fingerprint of the token stream — pure
    Column expression (whole-stage codegen, zero Python).

    fingerprint = fold over whitespace tokens of
    acc -> xxhash64(token, acc), seeded at 0; empty/blank docs -> 0.
    Chained hashing keeps it order-sensitive and whitespace-
    normalization-robust while staying inside JVM codegen — no
    per-row Python, no overflow (xxhash64 mixes instead of
    multiplying, so ANSI mode never throws).

    Format note (v2): round 1 computed an FNV-1a/Horner polynomial in
    a pandas UDF whose per-byte work was the slowest kernel in the
    repo; the fingerprint format was bumped to this JVM-side chain —
    same contract (deterministic doc identity), ~2 orders of magnitude
    less Python-side work at 100 TB.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(F.coalesce(c, F.lit("")))   # NULL text -> 0, like v1
    chained = F.aggregate(
        F.split(t, r"\s+"), F.lit(0).cast("long"),
        lambda acc, x: F.xxhash64(x, acc),
    )
    return F.when(F.length(t) == 0, F.lit(0).cast("long")).otherwise(chained)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + [n_tokens, n_chars_calc, quality, lang_pred]."""
    return (
        docs.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_chars_calc", F.length(text_col).cast("long"))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(F.col(text_col)))
    )


def tfidf_top_terms(docs: DataFrame, text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document -> (doc_id, term, tfidf, rn).

    Tokens are lowercased whitespace splits (the repo's cross-engine
    token convention, same as dedup.word n-grams). Smooth IDF:
    ``idf = ln((N + 1) / (df + 1)) + 1`` rounded to 6 dp BEFORE the
    tf multiply, so the score both engines rank by is the identical
    IEEE double (ln() may differ in the last ulp between libms; the
    6-dp quantization absorbs that). Ties break on term ASC.

    Scale shape: two hash aggregations with map-side partial agg
    (doc-term tf, then term df), one equi-join on term (AQE handles
    hot stopword terms), one per-doc window. Nothing driver-side
    except the N scalar. Reference parity: this is a new-engine
    training-data op (no ADOPT counterpart); tokenization matches
    functions/dedup.py:306.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select("doc_id").distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0), 6)
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term",
        (F.col("tf").cast("double") * idf).alias("tfidf"))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("doc_id", "term",
                    F.round("tfidf", 4).alias("tfidf"),
                    F.col("rn").cast("int").alias("rn")))


def doc_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (the Gopher/Dolma-style quality
    filters) -> (doc_id, n_words, dup_word_frac, dup_3gram_frac,
    top_word_frac), fractions rounded to 6 dp.

      * ``dup_word_frac``  = 1 - distinct_words / total_words
      * ``dup_3gram_frac`` = 1 - distinct_3grams / total_3grams
        (0.0 when the doc has fewer than 3 words)
      * ``top_word_frac``  = max single-word count / total_words

    Tokens are lowercased whitespace splits (the repo's cross-engine
    convention). The 3-gram list is built JVM-side with
    ``transform(sequence(...))`` over the token array — no window, no
    Python. Scale shape: two hash aggregations keyed by (doc_id, token)
    and (doc_id, gram) with map-side partial agg, then two per-doc
    roll-ups joined back — every key is document-bounded, so skew is
    capped by max document length, not corpus size. Docs with no
    tokens report zeros. Reference parity: new-engine training-data op
    (no ADOPT counterpart).
    """
    arr = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != "")
    base = docs.select("doc_id", arr.alias("arr"))
    toks = base.select("doc_id", F.explode("arr").alias("w"))
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    words = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_c"))

    grams = base.select(
        "doc_id",
        F.explode(
            F.when(F.size("arr") >= 3,
                   F.transform(
                       F.sequence(F.lit(0), F.size("arr") - 3),
                       lambda i: F.concat_ws(
                           " ", F.element_at(F.col("arr"), i + 1),
                           F.element_at(F.col("arr"), i + 2),
                           F.element_at(F.col("arr"), i + 3))))
            .otherwise(F.array().cast("array<string>"))).alias("g"))
    gc = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    g3 = gc.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"))

    out = (docs.select("doc_id")
           .join(words, "doc_id", "left")
           .join(g3, "doc_id", "left"))
    nw = F.coalesce(F.col("n_words"), F.lit(0))
    ng = F.coalesce(F.col("n_grams"), F.lit(0))
    return out.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        F.round(F.when(nw > 0,
                       1.0 - F.col("n_distinct") / nw.cast("double"))
                .otherwise(0.0), 6).alias("dup_word_frac"),
        F.round(F.when(ng > 0,
                       1.0 - F.col("n_distinct_grams") / ng.cast("double"))
                .otherwise(0.0), 6).alias("dup_3gram_frac"),
        F.round(F.when(nw > 0, F.col("max_c") / nw.cast("double"))
                .otherwise(0.0), 6).alias("top_word_frac"))


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon character entropy per document -> (doc_id, n_chars,
    entropy) with entropy in bits at 6 dp (0.0 for empty docs).

    The classic garbage detector: natural text sits ~3.5-4.5 bits,
    base64/compressed blobs push toward log2(alphabet), repeated-char
    spam drops toward 0. Per-term probabilities are exact rationals
    (count/len); the single log2 per (doc, char) is quantized at 6 dp
    so the cross-engine result is identical.

    Scale shape: one character explode (rows x doc length — the same
    fan-out the shingle pipeline already pays) + two doc-keyed hash
    aggregates with map-side partial agg; skew caps at max doc length.
    """
    chars = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).where(F.col("ch") != "")
    cc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    ent = (cc.join(tot, "doc_id")
           .groupBy("doc_id")
           .agg(F.round(-F.sum((F.col("c") / F.col("n"))
                               * F.log2(F.col("c") / F.col("n"))), 6)
                .alias("entropy"),
                F.first("n").alias("n_chars")))
    return (docs.select("doc_id").join(ent, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_chars"), F.lit(0)).cast("long")
                     .alias("n_chars"),
                    F.coalesce(F.col("entropy"), F.lit(0.0))
                     .alias("entropy")))


def _token_array(text_col: str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the repo's
    cross-engine tokenization (DuckDB twin:
    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), ...))."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != "")


def word_ngrams(arr: Column, n: int, step: int = 1) -> Column:
    """Space-joined word n-grams over a token array, built JVM-side
    with ``transform(sequence(...))`` — no window, no Python. With
    ``step=n`` the grams are non-overlapping blocks. Empty array when
    the doc has fewer than ``n`` tokens."""
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - n, F.lit(step)),
            lambda i: F.array_join(F.slice(arr, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def ngram_decontaminate(train: DataFrame, bench: DataFrame, n: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a benchmark/eval set -> (doc_id,
    n_hit_ngrams, n_bench_docs) for contaminated train docs only.

    The standard pre-training hygiene pass (GPT-3 appendix C /
    FineWeb use 13-grams at full scale; 4 here so the synthetic
    fixture has non-trivial overlap). Both sides shingle to DISTINCT
    (doc_id, gram) rows, the candidate step is a gram equi-join —
    never a doc x doc comparison.

    Scale shape: the benchmark side is tiny by construction (eval
    suites, not corpora), so its distinct-gram set is broadcast and
    the train side never shuffles; per-gram skew is capped because
    train grams are deduped per doc. At 100 TB swap the gram string
    for xxhash64(gram) to shrink the broadcast — kept as text here so
    the DuckDB oracle can rebuild it verbatim. Reference parity:
    new-engine training-data op (no ADOPT counterpart).
    """
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(word_ngrams(_token_array(text_col), n)).alias("g"),
        ).distinct()

    tg = grams(train)
    bg = grams(bench).withColumnRenamed("doc_id", "bench_doc")
    hits = tg.join(F.broadcast(bg), "g")
    return (hits.groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_hit_ngrams"),
                 F.countDistinct("bench_doc").alias("n_bench_docs")))


def dup_block_stats(docs: DataFrame, block: int = 8,
                    text_col: str = "text") -> DataFrame:
    """Corpus-wide duplicate-text-block fractions -> (doc_id,
    n_blocks, n_dup_blocks, dup_block_frac 6dp).

    Splits each doc into NON-overlapping ``block``-token chunks and
    counts, per doc, how many of its chunks occur more than once in
    the whole corpus (boilerplate / copy-paste mass — the
    RefinedWeb-style intra-corpus repetition signal, finer-grained
    than whole-doc exact dedup). Docs shorter than one block report
    zeros.

    Scale shape: one explode (corpus tokens / block rows), one
    gram-keyed count with map-side partial agg (skew = most-common
    boilerplate block, the quantity being measured), one doc-keyed
    roll-up. No joins wider than the gram count.
    """
    blocks = docs.select(
        "doc_id",
        F.explode(word_ngrams(_token_array(text_col), block, step=block))
         .alias("g"))
    cnt = blocks.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (blocks.join(cnt, "g")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_blocks"),
                    F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                     .alias("n_dup_blocks")))
    nb = F.coalesce(F.col("n_blocks"), F.lit(0))
    nd = F.coalesce(F.col("n_dup_blocks"), F.lit(0))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    nb.cast("long").alias("n_blocks"),
                    nd.cast("long").alias("n_dup_blocks"),
                    F.round(F.when(nb > 0, nd.cast("double") / nb)
                            .otherwise(0.0), 6).alias("dup_block_frac")))


def collocations(docs: DataFrame, min_count: int = 10, k: int = 50,
                 text_col: str = "text") -> DataFrame:
    """Top-k bigram collocations by association lift -> (w1, w2, c_xy,
    lift 6dp), lift = P(w1 w2) / (P(w1) P(w2)); PMI = log2(lift).

    The collocation-extraction primitive (phrase mining / tokenizer
    vocab prep). Unigram probabilities come from the full token
    stream (N tokens), bigram probabilities from the adjacent-pair
    stream (M = N - n_docs pairs). The ranking statistic is computed
    as ONE double division of two exact BIGINT products
    (c_xy*N*N / (M*c_x*c_y)) so both engines produce the identical
    IEEE double — no cross-engine log ulps; ties rank by (w1, w2).

    Scale shape: two hash aggregates (bigram counts, unigram counts)
    with map-side partial agg + two broadcast-sized joins on the
    word; the bigram count table is vocabulary², not corpus-sized.
    The BIGINT products stay exact in a double up to N ~ 9e15 /
    (max c_xy) — far past any real corpus token count.
    """
    arr = docs.select(_token_array(text_col).alias("a"))
    toks = arr.select(F.explode("a").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    n_tot = toks.groupBy().agg(F.count(F.lit(1)).alias("n"))

    bi = arr.select(F.explode(word_ngrams(F.col("a"), 2)).alias("g"))
    pair = bi.select(F.split("g", " ").alias("p")).select(
        F.element_at("p", 1).alias("w1"), F.element_at("p", 2).alias("w2"))
    bc = pair.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    m_tot = pair.groupBy().agg(F.count(F.lit(1)).alias("m"))

    scored = (bc.where(F.col("c_xy") >= min_count)
              .join(uni.withColumnRenamed("w", "w1")
                       .withColumnRenamed("c1", "cx"), "w1")
              .join(uni.withColumnRenamed("w", "w2")
                       .withColumnRenamed("c1", "cy"), "w2")
              .crossJoin(F.broadcast(n_tot))
              .crossJoin(F.broadcast(m_tot))
              .select("w1", "w2", "c_xy",
                      F.round((F.col("c_xy") * F.col("n") * F.col("n"))
                              .cast("double")
                              / (F.col("m") * F.col("cx") * F.col("cy"))
                              .cast("double"), 6).alias("lift")))
    w = Window.orderBy(F.desc("lift"), "w1", "w2")
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k).drop("rk"))


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS slope/intercept of ln(freq) on ln(rank), rank = dense
    frequency order (freq DESC, term ASC). Natural-text corpora land
    near slope -1; a far-off slope flags synthetic/degenerate text —
    a standard corpus-level quality signal.

    Cross-engine determinism: both ln() inputs are quantized to 6 dp
    before the regression and the outputs to 6 dp after it, so libm
    last-ulp and summation-order differences cannot leak into the
    contract hash. One row out: [n_terms, slope, intercept].

    Scale shape: one token hash-agg (map-side partial), then a
    global-order row_number over the AGGREGATED vocabulary — orders
    of magnitude smaller than the corpus, but still a single-
    partition sort; at 100-TB corpus scale cap it first (e.g.
    ``freq.orderBy(desc, asc).limit(1_000_000)`` — Zipf fits are
    conventionally taken over the head of the distribution anyway).
    Final step is one regr_slope/regr_intercept aggregate.
    Tokenization matches tfidf_top_terms / dedup word n-grams.
    """
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"),
    ).where(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = freq.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("rank").cast("double")), 6).alias("lr"),
        F.round(F.log(F.col("freq").cast("double")), 6).alias("lf"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("slope"),
        F.round(F.regr_intercept("lf", "lr"), 6).alias("intercept"))


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document surprisal under the corpus unigram LM — a standard
    training-data quality score: p(w) = corpus_count(w) / N_tokens,
    score = mean over the doc's tokens of -ln p(w). Low scores flag
    boilerplate/duplicated text, high scores flag rare-token noise.
    No smoothing is needed: every scored token is, by construction, in
    the model's own vocabulary.

    Cross-engine determinism: counts are exact integers; the single
    -ln division is rounded to 6 dp AFTER the per-doc mean, the same
    libm-tolerance discipline as zipf_fit/char_entropy.

    Scale shape: one token hash-agg for the vocabulary counts
    (map-side partial), the 1-row corpus total broadcast, then the
    token stream re-joined to the vocabulary (vocabulary-sized build
    side — broadcastable far beyond 100 TB of text) and ONE doc-keyed
    aggregate. Tokenization matches tfidf_top_terms / zipf_fit.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"),
    ).where(F.col("term") != "")
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    total = cf.agg(F.sum("cf").alias("n_total"))
    return (toks.join(F.broadcast(cf), "term")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-F.log(F.col("cf") / F.col("n_total"))), 6)
                  .alias("surprisal")))


UNIGRAM_LOGPROB_SQL = """WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
), toks_f AS (
    SELECT doc_id, term FROM toks WHERE term <> ''
), cf AS (
    SELECT term, count(*) AS cf FROM toks_f GROUP BY term
), total AS (
    SELECT sum(cf) AS n_total FROM cf
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(c.cf / CAST(tt.n_total AS DOUBLE))), 6) AS surprisal
FROM toks_f t JOIN cf c USING (term), total tt
GROUP BY t.doc_id"""


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document surprisal under an add-one-smoothed corpus bigram
    LM: p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), score = mean over
    the doc's bigrams of -ln p. The sequential-context sibling of
    unigram_logprob: boilerplate with common words in rare ORDER now
    scores high, verbatim-duplicated passages score low.

    Smoothing is mandatory here (unlike the unigram score): a
    document's bigrams are corpus-attested by construction, but the
    conditional's denominator must dominate unseen continuations, and
    add-one with V = corpus vocabulary size is the deterministic
    textbook choice.

    Scale shape: tokenization with positions (posexplode), bigrams by
    an equi-join on (doc, pos+1) — no per-doc windows anywhere — one
    bigram hash-agg, one context hash-agg, the scalar V broadcast,
    then one doc-keyed mean. 6 dp after the mean, same libm
    discipline as unigram_logprob.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("i", "term"),
    ).where(F.col("term") != "")
    nxt = toks.select(
        F.col("doc_id"), (F.col("i") - 1).alias("i"),
        F.col("term").alias("nxt"))
    big = toks.join(nxt, ["doc_id", "i"]).select("doc_id", "term", "nxt")
    bc = big.groupBy("term", "nxt").agg(F.count(F.lit(1)).alias("cb"))
    cc = big.groupBy("term").agg(F.count(F.lit(1)).alias("cc"))
    vocab = toks.agg(F.countDistinct("term").alias("v"))
    return (big.join(bc, ["term", "nxt"]).join(cc, "term")
            .crossJoin(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(-F.log((F.col("cb") + 1)
                                      / (F.col("cc") + F.col("v"))
                                      .cast("double"))), 6)
                  .alias("surprisal")))


BIGRAM_LOGPROB_SQL = """WITH toks AS MATERIALIZED (
    SELECT doc_id, i, term FROM (
        SELECT doc_id,
               generate_subscripts(t, 1) AS i, unnest(t) AS term
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM documents)
    ) WHERE term <> ''
), big AS MATERIALIZED (
    SELECT a.doc_id, a.term, b.term AS nxt
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
), bc AS (SELECT term, nxt, count(*) AS cb FROM big GROUP BY term, nxt),
cc AS (SELECT term, count(*) AS cc FROM big GROUP BY term),
vocab AS (SELECT count(DISTINCT term) AS v FROM toks)
SELECT g.doc_id, count(*) AS n_bigrams,
       round(avg(-ln((bc.cb + 1) / CAST(cc.cc + vocab.v AS DOUBLE))), 6)
         AS surprisal
FROM big g
JOIN bc ON bc.term = g.term AND bc.nxt = g.nxt
JOIN cc ON cc.term = g.term, vocab
GROUP BY g.doc_id"""


def bm25_topk(docs: DataFrame, queries: list[tuple[int, str]],
              text_col: str = "text", k: int = 5) -> DataFrame:
    """BM25 ranked retrieval -> (query_id, doc_id, score, rn).

    The batch shape of a search backfill: score a (small, broadcast)
    query set against every document and keep the top-``k`` docs per
    query. Okapi BM25 with k1=1.2, b=0.75 and the Lucene-style
    non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``; query
    terms are deduplicated (query-side tf = 1).

    Cross-engine float discipline: idf is quantized to 6 dp before
    the tf multiply (absorbs libm ln() ulps, same trick as
    tfidf_top_terms); each term's contribution is then snapped to the
    integer micro lattice (floor(x*1e6 + 0.5) — exact BIGINT) so the
    per-document SUM is order-independent and bit-identical in any
    engine; ranking sorts the exact lattice sum with doc_id ASC ties.

    Scale shape: two hash aggs (tf, df) + one per-doc agg (dl), a
    broadcast join against the query terms, one final (query, doc)
    aggregation, and a per-query top-k window over candidates that
    matched at least one query term — never all docs. The only
    driver-side values are the two corpus scalars (N, total tokens).
    """
    spark = docs.sparkSession
    qdf = spark.createDataFrame(list(queries), "query_id int, qtext string")
    qterms = (qdf.select(
        "query_id",
        F.explode(F.split(F.trim(F.lower("qtext")), r"\s+")).alias("term"))
        .where(F.col("term") != "").distinct())
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term")).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.select("doc_id").distinct().count()
    total_tokens = toks.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf6 = F.round(F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))), 6)
    ratio = ((F.col("dl") * F.lit(int(n_docs))).cast("double")
             / F.lit(float(total_tokens)))
    denom = (F.col("tf").cast("double")
             + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * ratio))
    contrib = idf6 * (F.col("tf").cast("double") * F.lit(2.2) / denom)
    micro = F.floor(contrib * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (tf.join(F.broadcast(qterms), "term")
              .join(dfreq, "term").join(dl, "doc_id")
              .select("query_id", "doc_id", micro.alias("micro"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("micro").alias("sm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sm"), F.asc("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("query_id", "doc_id",
                    F.round(F.col("sm").cast("double") / 1000000.0, 6)
                    .alias("score"),
                    F.col("rn").cast("int").alias("rn")))


def bm25_topk_sql(queries: list[tuple[int, str]], k: int = 5) -> str:
    """DuckDB twin of :func:`bm25_topk` (same lattice, same ties)."""
    values = ", ".join(f"({qid}, '{q}')" for qid, q in queries)
    return f"""
WITH q(query_id, qtext) AS (VALUES {values}),
qterms AS (
    SELECT DISTINCT query_id,
           unnest(regexp_split_to_array(trim(lower(qtext)), '\\s+')) AS term
    FROM q
), toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
    FROM documents
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
tt AS (SELECT count(*) AS t FROM toks2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
    SELECT qterms.query_id, tf.doc_id,
           CAST(floor(
               round(ln(1.0 + (CAST(n.n AS DOUBLE) - dfreq.df + 0.5)
                              / (dfreq.df + 0.5)), 6)
               * (CAST(tf.tf AS DOUBLE) * 2.2
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl * n.n AS DOUBLE)
                                             / CAST(tt.t AS DOUBLE)))))
               * 1000000.0 + 0.5) AS BIGINT) AS micro
    FROM tf
    JOIN qterms USING (term)
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN n CROSS JOIN tt
), scored AS (
    SELECT query_id, doc_id, sum(micro) AS sm
    FROM contrib GROUP BY 1, 2
), ranked AS (
    SELECT query_id, doc_id, sm,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sm DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       round(CAST(sm AS DOUBLE) / 1000000.0, 6) AS score,
       CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {int(k)}
""".strip()


def dup_span_stats(docs: DataFrame, n: int = 8,
                   text_col: str = "text") -> DataFrame:
    """Maximal duplicated-substring spans per document -> (doc_id,
    n_spans, dup_tokens, n_tokens, dup_frac 6dp).

    The ExactSubstr signal (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): a token position is duplicated if
    it lies inside a word ``n``-gram that occurs more than once in
    the whole corpus; overlapping/contiguous duplicated shingles
    merge into MAXIMAL spans (stride-1 shingles, unlike
    dup_block_stats' disjoint blocks), so ``dup_tokens`` is the exact
    number of tokens inside verbatim-repeated regions of length >= n.

    Scale shape: one shingle explode (corpus-tokens rows), one
    gram-keyed count (map-side partial agg; boilerplate grams are the
    hot keys being measured), one gram equi-join back, then a per-doc
    window interval-merge — never doc x doc, never a suffix array.
    At 100 TB the gram key would be hashed (xxhash64) instead of the
    string itself to shrink the shuffle; the string key keeps the
    fixture oracle-identical.
    """
    arr = _token_array(text_col)
    grams = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(arr, n, step=1)).alias("i", "g"))
    cnt = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    starts = (grams.join(cnt, "g").where(F.col("c") > 1)
              .select("doc_id", "i"))
    w_prev = (Window.partitionBy("doc_id").orderBy("i")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc_id").orderBy("i")
             .rowsBetween(Window.unboundedPreceding, 0))
    flagged = starts.withColumn(
        "new_span",
        F.when(F.col("i") > F.coalesce(F.max(F.col("i") + n - 1).over(w_prev),
                                       F.lit(-2)) + 1, 1).otherwise(0))
    spans = (flagged.withColumn("span_id", F.sum("new_span").over(w_run))
             .groupBy("doc_id", "span_id")
             .agg(F.min("i").alias("s"),
                  (F.max("i") + n - 1).alias("e")))
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))
    base = docs.select("doc_id", F.size(arr).cast("long").alias("n_tokens"))
    ns = F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
    dt = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
    return (base.join(per_doc, "doc_id", "left")
            .select("doc_id", ns.alias("n_spans"), dt.alias("dup_tokens"),
                    "n_tokens",
                    F.when(F.col("n_tokens") > 0,
                           F.round(dt.cast("double") / F.col("n_tokens"), 6))
                     .otherwise(F.lit(0.0)).alias("dup_frac")))


def dup_span_stats_sql(n: int = 8) -> str:
    """DuckDB twin of :func:`dup_span_stats` (same merge convention:
    spans merge when overlapping or contiguous)."""
    return f"""
WITH arr AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS a
    FROM documents
), pos AS (
    SELECT doc_id, a,
           unnest(generate_series(1, len(a) - {n - 1})) AS i
    FROM arr WHERE len(a) >= {n}
), grams AS (
    SELECT doc_id, i, array_to_string(a[i : i + {n - 1}], ' ') AS g
    FROM pos
), cnt AS (
    SELECT g, count(*) AS c FROM grams GROUP BY 1
), starts AS (
    SELECT doc_id, i FROM grams JOIN cnt USING (g) WHERE cnt.c > 1
), flagged AS (
    SELECT doc_id, i,
           CASE WHEN i > coalesce(max(i + {n - 1}) OVER (
                    PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), -2) + 1 THEN 1 ELSE 0 END AS new_span
    FROM starts
), spans AS (
    SELECT doc_id,
           sum(new_span) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS span_id,
           i
    FROM flagged
), merged AS (
    SELECT doc_id, span_id, min(i) AS s, max(i) + {n - 1} AS e
    FROM spans GROUP BY 1, 2
), per_doc AS (
    SELECT doc_id, count(*) AS n_spans,
           sum(e - s + 1) AS dup_tokens
    FROM merged GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(len(d.a) AS BIGINT) AS n_tokens,
       CASE WHEN len(d.a) > 0
            THEN round(CAST(coalesce(p.dup_tokens, 0) AS DOUBLE)
                       / len(d.a), 6)
            ELSE 0.0 END AS dup_frac
FROM arr d LEFT JOIN per_doc p USING (doc_id)
""".strip()
