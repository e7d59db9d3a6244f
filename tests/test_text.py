"""Text analysis functions vs hand-computed and DuckDB-computed truth."""

import duckdb
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.text import (
    doc_fingerprint, lang_id, quality_score, text_stats, token_count,
)

SF = "/root/testdata/sf0.001"


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",), ("x\ty\nz w",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 0, 0, 1, 4]


def test_token_count_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = docs.select(F.sum(token_count("text")).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT sum(CASE WHEN length(trim(text))=0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
            FROM '{SF}/documents.parquet'"""
    ).fetchone()[0]
    assert got == exp


def test_quality_score_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = docs.select(
        F.min(quality_score("text")).alias("lo"),
        F.max(quality_score("text")).alias("hi"),
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_lang_id_on_known_text(spark):
    samples = [
        ("the cat and the dog went to the house of friends", "en"),
        ("der Hund und die Katze sind nicht mit dem Auto", "de"),
        ("le chat et la maison dans les montagnes pour une vie", "fr"),
        ("el perro y la casa de los amigos en un lugar", "es"),
        ("我 的 朋友 是 一个 好 人 他 不 在 这", "zh"),
        ("zzz qqq xxx", "unk"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in samples], "text string")
    got = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert got == [lang for _, lang in samples]


def test_fingerprint_deterministic_and_whitespace_robust(spark):
    df = spark.createDataFrame(
        [(1, "hello  world foo"), (2, "hello world   foo"), (3, "hello world bar")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in
           df.select("id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]          # whitespace-insensitive
    assert fps[1] != fps[3]          # content-sensitive
    # order-sensitive
    df2 = spark.createDataFrame([(1, "world hello foo")], "id long, text string")
    fp2 = df2.select(doc_fingerprint(F.col("text"))).collect()[0][0]
    assert fp2 != fps[1]


def test_text_stats_schema(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = text_stats(docs)
    assert {"n_tokens", "n_chars_calc", "quality", "lang_pred"} <= set(out.columns)
    assert out.count() == 50


def test_doc_repetition_vs_python(spark):
    from adopt_spark.functions.text import doc_repetition

    docs = [(1, "a b a b a b a"),          # heavy repetition
            (2, "one two three four"),      # all distinct
            (3, "x y"),                     # < 3 words: no 3-grams
            (4, ""),                        # empty
            (5, "  spaced   out \t words  here  ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in doc_repetition(df).collect()}

    for doc_id, text in docs:
        ws = [w for w in text.lower().split() if w]
        grams = [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
        n, g = len(ws), len(grams)
        r = got[doc_id]
        assert r.n_words == n
        assert r.dup_word_frac == round(
            1 - len(set(ws)) / n, 6) if n else r.dup_word_frac == 0.0
        assert r.dup_3gram_frac == (
            round(1 - len(set(grams)) / g, 6) if g else 0.0)
        top = max((ws.count(w) for w in set(ws)), default=0)
        assert r.top_word_frac == (round(top / n, 6) if n else 0.0)


def test_char_entropy_vs_python(spark):
    from adopt_spark.functions.text import char_entropy

    import collections
    import math

    docs = [(1, "aaaa"),              # zero entropy
            (2, "abab"),              # exactly 1 bit
            (3, "the quick brown fox"),
            (4, ""),                  # empty -> 0.0 / 0 chars
            (5, "a b\tc\nd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars, r.entropy)
           for r in char_entropy(df).collect()}
    for doc_id, text in docs:
        n = len(text)
        if n == 0:
            assert got[doc_id] == (0, 0.0)
            continue
        cnt = collections.Counter(text)
        h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        nc, e = got[doc_id]
        assert nc == n
        assert abs(e - h) < 2e-6, (doc_id, e, h)
    assert got[1][1] == 0.0 and got[2][1] == 1.0


def test_ngram_decontaminate_vs_python(spark):
    from adopt_spark.functions.text import ngram_decontaminate

    bench = [(100, "alpha beta gamma delta epsilon"),
             (101, "one two three four five six")]
    train = [(1, "x alpha beta gamma delta y"),          # 1 shared 4-gram
             (2, "one two three four two three four five"),  # hits 2 grams
             (3, "nothing in common at all here"),
             (4, "alpha beta gamma delta epsilon zeta")]  # 2 shared grams
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r.doc_id: (r.n_hit_ngrams, r.n_bench_docs)
           for r in ngram_decontaminate(tdf, bdf, n=4).collect()}

    def grams(t):
        ws = t.lower().split()
        return {" ".join(ws[i:i + 4]) for i in range(len(ws) - 3)}

    bg = {}
    for did, t in bench:
        for g in grams(t):
            bg.setdefault(g, set()).add(did)
    exp = {}
    for did, t in train:
        hit = {g for g in grams(t) if g in bg}
        if hit:
            exp[did] = (len(hit),
                        len(set().union(*(bg[g] for g in hit))))
    assert got == exp
    assert 3 not in got  # clean docs are absent, not zero-rowed


def test_dup_block_stats_vs_python(spark):
    from adopt_spark.functions.text import dup_block_stats

    docs = [(1, "a b c d e f g h i j"),    # blocks: [a..h]; tail dropped
            (2, "a b c d e f g h"),        # same block as doc 1 -> dup
            (3, "z y x w v u t s"),        # unique block
            (4, "a b c"),                  # shorter than one block -> zeros
            (5, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_blocks, r.n_dup_blocks, r.dup_block_frac)
           for r in dup_block_stats(df, block=8).collect()}
    assert got[1] == (1, 1, 1.0)
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0.0)


def test_collocations_vs_python(spark):
    import collections
    from adopt_spark.functions.text import collocations

    corpus = [(1, "strong tea strong tea strong tea weak tea"),
              (2, "strong tea strong coffee weak coffee strong tea"),
              (3, "weak tea strong tea strong tea weak coffee")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [(r.w1, r.w2, r.c_xy, r.lift)
           for r in collocations(df, min_count=2, k=3).collect()]

    uni, bi = collections.Counter(), collections.Counter()
    n = m = 0
    for _, t in corpus:
        ws = t.split()
        uni.update(ws)
        n += len(ws)
        pairs = list(zip(ws, ws[1:]))
        bi.update(pairs)
        m += len(pairs)
    scored = sorted(
        ((w1, w2, c, round(c * n * n / (m * uni[w1] * uni[w2]), 6))
         for (w1, w2), c in bi.items() if c >= 2),
        key=lambda r: (-r[3], r[0], r[1]))[:3]
    assert got == scored


def test_dataset_card_recomposition(spark):
    """The card's fields equal the independently computed stages."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    rows = [(1, "en", "the cat and the dog"),
            (2, "en", "the cat  and the dog"),     # dup after norm
            (3, "de", "der hund"),
            (4, "de", "")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        card = R.q_dataset_card(spark, "ignored").collect()[0]
    assert card.n_docs == 4
    assert card.n_langs == 2
    assert card.total_tokens == 5 + 5 + 2 + 0
    assert card.dup_rate == 0.25           # docs 1 and 2 collapse
    assert card.median_tokens == 3.5


def test_tfidf_sim_vs_python(spark):
    """Sparse cosine join replayed with Counter/math on a small
    corpus with planted near-duplicates."""
    import math
    import re
    from collections import Counter
    from unittest import mock

    from adopt_spark.queries import registry as R

    rows = [
        (1, "en", "alpha beta gamma delta"),
        (2, "en", "alpha beta gamma delta epsilon"),   # near-dup of 1
        (3, "en", "zeta eta theta"),
        (4, "en", "zeta eta theta iota"),              # near-dup of 3
        (5, "en", "completely different words here"),
        (6, "en", "alpha zeta mixed bag content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {(r.doc_a, r.doc_b): (r.n_shared, r.cosine)
               for r in R.q_tfidf_sim(spark, "x").collect()}

    n = len(rows)
    tf = {}
    dfc = Counter()
    for did, _, text in rows:
        c = Counter(t for t in re.split(r"\s+", text.strip().lower()) if t)
        tf[did] = c
        for t in c:
            dfc[t] += 1
    w = {did: {t: round(c * math.log(n / dfc[t]), 6)
               for t, c in cs.items() if dfc[t] <= R._TFIDF_SIM_MAX_DF}
         for did, cs in tf.items()}
    nrm = {d: math.sqrt(sum(x * x for x in ws.values()))
           for d, ws in w.items()}
    want = {}
    for a in w:
        for b in w:
            if a < b:
                shared = set(w[a]) & set(w[b])
                if not shared:
                    continue
                cos = round(sum(w[a][t] * w[b][t] for t in shared)
                            / (nrm[a] * nrm[b]), 6)
                if cos >= R._TFIDF_SIM_MIN_COS:
                    want[(a, b)] = (len(shared), cos)
    assert got == want
    assert (1, 2) in got and (3, 4) in got      # planted near-dups
    assert got[(1, 2)][1] > 0.7
