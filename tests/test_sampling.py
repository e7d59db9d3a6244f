"""Deterministic stratified sampling + the two other round-3 additions
(degree_stats, tfidf_top_terms), differentially tested against plain
numpy/pandas references on the same data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from adopt_spark.functions.sampling import sample_gate, stratified_sample


def _py_gate(key: int) -> int:
    return ((key % 100_000_007) * 2_654_435_761 + 11) % 1_000_000_007 % 1000


def test_gate_matches_python_reference(spark):
    keys = list(range(0, 5000, 7)) + [2**40 + 3, 2**62 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.g for r in
           df.select("k", sample_gate(F.col("k")).alias("g")).collect()}
    for k in keys:
        assert got[k] == _py_gate(k), k


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, ["en", "zh", "fr"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang",
                            {"en": 200, "zh": 800}, 500).toPandas()
    # exact membership vs the python gate
    expect = {(i, l) for i, l in rows
              if _py_gate(i) < {"en": 200, "zh": 800}.get(l, 500)}
    assert set(zip(out.doc_id, out.lang)) == expect
    # audit columns carry the gate + applied rate
    for _, r in out.iterrows():
        assert r.gate == _py_gate(r.doc_id)
        assert r.rate == {"en": 200, "zh": 800}.get(r.lang, 500)
    # two runs identical (no rand() anywhere)
    again = stratified_sample(df, "doc_id", "lang",
                              {"en": 200, "zh": 800}, 500).toPandas()
    assert sorted(again.doc_id) == sorted(out.doc_id)


def test_degree_stats_vs_numpy(spark):
    from adopt_spark.algos.vertex_metrics import degree_stats

    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
             if a != b}
    df = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    row = degree_stats(df).collect()[0]

    e = np.array(sorted(pairs))
    out = pd.Series(e[:, 0]).value_counts()
    ind = pd.Series(e[:, 1]).value_counts()
    assert row.n_vertices == len(set(e[:, 0]) | set(e[:, 1]))
    assert row.n_edges == len(pairs)
    assert math.isclose(row.avg_outdeg, round(out.mean(), 6), abs_tol=1e-9)
    assert row.max_outdeg == out.max()
    assert math.isclose(row.avg_indeg, round(ind.mean(), 6), abs_tol=1e-9)
    assert row.max_indeg == ind.max()
    per_edge = np.array([(out[a], ind[b]) for a, b in e], dtype=float)
    r = np.corrcoef(per_edge[:, 0], per_edge[:, 1])[0, 1]
    assert math.isclose(row.assortativity, round(r, 6), abs_tol=1e-6)


def test_tfidf_top_terms_vs_pandas(spark):
    from adopt_spark.functions.text import tfidf_top_terms

    docs = [(1, "apple banana apple cherry"),
            (2, "banana banana date"),
            (3, "apple  date\tdate fig fig fig"),
            (4, "unique words only here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).toPandas()

    rows = []
    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    for d, t in docs:
        for w in t.lower().split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq: dict[str, int] = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    for (d, w), c in tf.items():
        idf = round(math.log((n + 1) / (dfreq[w] + 1)) + 1, 6)
        rows.append((d, w, c * idf))
    ref = pd.DataFrame(rows, columns=["doc_id", "term", "tfidf"])
    ref["rn"] = (ref.sort_values(["tfidf", "term"],
                                 ascending=[False, True])
                 .groupby("doc_id").cumcount() + 1)
    ref = ref[ref.rn <= 2]
    ref["tfidf"] = ref.tfidf.round(4)

    got = {(r.doc_id, r.rn): (r.term, r.tfidf) for r in out.itertuples()}
    want = {(r.doc_id, r.rn): (r.term, round(r.tfidf, 4))
            for r in ref.itertuples()}
    assert got == want


def test_reciprocity_vs_python(spark):
    from adopt_spark.algos.vertex_metrics import reciprocity

    # 2<->3 and 7<->8 mutual; a loop and a duplicate must be ignored
    pairs = [(1, 2), (2, 3), (3, 2), (4, 5), (7, 8), (8, 7), (8, 7),
             (9, 9), (5, 6)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    row = reciprocity(df).collect()[0]
    clean = {(a, b) for a, b in pairs if a != b}
    rec = sum(1 for a, b in clean if (b, a) in clean)
    assert row.n_edges == len(clean)
    assert row.n_reciprocal == rec
    assert row.reciprocity == round(rec / len(clean), 6)


def test_reciprocity_empty(spark):
    from adopt_spark.algos.vertex_metrics import reciprocity

    empty = spark.createDataFrame([], "sid long, tid long")
    row = reciprocity(empty).collect()[0]
    assert (row.n_edges, row.n_reciprocal, row.reciprocity) == (0, 0, 0.0)


def test_bipartite_project_vs_python(spark):
    from adopt_spark.edges import bipartite_project

    # baskets: g1={1,2,3}, g2={2,3}, g3={1,2,3,4,5} (dropped by cap 4),
    # g4={2,3}; duplicate (g1,2) row must not inflate weights
    rows = [(1, 1), (1, 2), (1, 2), (1, 3), (2, 2), (2, 3),
            (3, 1), (3, 2), (3, 3), (3, 4), (3, 5), (4, 2), (4, 3)]
    df = spark.createDataFrame(rows, "g long, item long")
    got = {(r.sid, r.tid): r.weight
           for r in bipartite_project(df, "g", "item", min_weight=2,
                                      max_group_size=4).collect()}
    # surviving baskets: {1,2,3}, {2,3}, {2,3} -> (2,3) x3, (1,2) x1,
    # (1,3) x1; min_weight=2 keeps only (2,3)
    assert got == {(2, 3): 3}
    # without cap or threshold g3's pairs count too
    full = {(r.sid, r.tid): r.weight
            for r in bipartite_project(df, "g", "item").collect()}
    assert full[(2, 3)] == 4 and full[(1, 2)] == 2 and full[(4, 5)] == 1


def test_group_centroids_vs_numpy(spark):
    from adopt_spark.functions.similarity import group_centroids

    rng = np.random.default_rng(11)
    rows = [(int(i % 3), rng.standard_normal(8).astype("float32").tolist())
            for i in range(30)]
    df = spark.createDataFrame(rows, "label long, embedding array<float>")
    got = {(r.label, r.pos): r.centroid
           for r in group_centroids(df, "label").collect()}
    import collections
    acc = collections.defaultdict(list)
    for lab, vec in rows:
        acc[lab].append(np.asarray(vec, dtype=np.float64))
    for lab, vecs in acc.items():
        mean = np.mean(vecs, axis=0)
        for pos in range(8):
            assert abs(got[(lab, pos)] - round(float(mean[pos]), 6)) < 2e-6


def test_directed_triad_counts_vs_python(spark):
    from adopt_spark.algos.vertex_metrics import directed_triad_counts

    import itertools

    rng = np.random.default_rng(3)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 14, (80, 2))
             if a != b}
    df = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    row = directed_triad_counts(df).collect()[0]

    cyc = sum(1 for a, b, c in itertools.permutations(range(14), 3)
              if a < b and a < c
              and (a, b) in pairs and (b, c) in pairs and (c, a) in pairs)
    tra = sum(1 for a, b, c in itertools.permutations(range(14), 3)
              if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs)
    assert (row.n_cyclic, row.n_transitive) == (cyc, tra)


def test_directed_triad_counts_hand_fixture(spark):
    from adopt_spark.algos.vertex_metrics import directed_triad_counts

    # one 3-cycle (1,2,3), its reverse absent; one feed-forward (4,5,6)
    pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (4, 6)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    row = directed_triad_counts(df).collect()[0]
    assert (row.n_cyclic, row.n_transitive) == (1, 1)
    # adding the reverse cycle doubles the cyclic count
    df2 = spark.createDataFrame(pairs + [(2, 1), (1, 3), (3, 2)],
                                "sid long, tid long")
    row2 = directed_triad_counts(df2).collect()[0]
    assert row2.n_cyclic == 2


def test_quality_gate_contract_shape(spark):
    # registry-level check: per-language keep-rate is ~half, never more
    # than ceil(n/2)+ties, and the kept set is the TOP by (q, doc_id)
    from adopt_spark.queries.registry import q_quality_gate
    from adopt_spark.functions.text import quality_score
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    kept = q_quality_gate(spark, sf).toPandas()
    alldf = (spark.read.parquet(f"{sf}/documents.parquet")
             .select("doc_id", "lang",
                     F.round(quality_score("text"), 4).alias("q"))
             .toPandas())
    for lang, grp in alldf.groupby("lang"):
        order = grp.sort_values(["q", "doc_id"],
                                ascending=[False, True]).reset_index()
        n = len(order)
        k = len(kept[kept.lang == lang])
        assert 0 < k <= n
        # kept == the first k rows of the deterministic ordering
        want = set(order.doc_id[:k])
        got = set(kept[kept.lang == lang].doc_id)
        assert got == want, lang
        # percent_rank(kth row) <= 0.5 < percent_rank(k+1th row)
        if n > 1 and k < n:
            assert (k - 1) / (n - 1) <= 0.5 < k / (n - 1)


def test_centroid_similarity_vs_numpy(spark):
    from adopt_spark.functions.similarity import centroid_similarity

    rng = np.random.default_rng(21)
    rows = [(int(i % 3), rng.standard_normal(6).astype("float32").tolist())
            for i in range(24)]
    df = spark.createDataFrame(rows, "label long, embedding array<float>")
    got = {(r.a, r.b): r.cosine
           for r in centroid_similarity(df, "label").collect()}

    cents = {}
    for lab in range(3):
        vecs = [np.asarray(v, dtype=np.float64)
                for l, v in rows if l == lab]
        cents[lab] = np.round(np.mean(vecs, axis=0), 6)  # 6 dp like engine
    for a in range(3):
        for b in range(a + 1, 3):
            cos = float(cents[a] @ cents[b]
                        / (np.linalg.norm(cents[a])
                           * np.linalg.norm(cents[b])))
            assert abs(got[(a, b)] - round(cos, 6)) < 3e-6, (a, b)
    assert len(got) == 3


def test_butterfly_count_vs_itertools(spark):
    import itertools

    import numpy as np

    from adopt_spark.edges import butterfly_count

    rng = np.random.default_rng(5)
    rows = {(int(g), int(i))
            for g, i in zip(rng.integers(0, 12, 300),
                            rng.integers(100, 118, 300))}
    df = spark.createDataFrame(sorted(rows), "g long, item long")
    got = butterfly_count(df, "g", "item").collect()[0]

    items = {}
    for g, i in rows:
        items.setdefault(g, set()).add(i)
    n_bf = 0
    pair_w = {}
    for g1, g2 in itertools.combinations(sorted(items), 2):
        shared = items[g1] & items[g2]
        n_bf += len(shared) * (len(shared) - 1) // 2
    for g, its in items.items():
        for a, b in itertools.combinations(sorted(its), 2):
            pair_w[(a, b)] = pair_w.get((a, b), 0) + 1
    pairs2 = {p: w for p, w in pair_w.items() if w >= 2}
    assert got.n_butterflies == sum(w * (w - 1) // 2
                                    for w in pairs2.values()) == n_bf
    assert got.n_item_pairs == len(pairs2)
    assert got.max_pair_weight == max(pairs2.values(), default=0)


def test_butterfly_count_empty_and_cap(spark):
    from adopt_spark.edges import butterfly_count

    empty = spark.createDataFrame([], "g long, item long")
    r = butterfly_count(empty, "g", "item").collect()[0]
    assert (r.n_butterflies, r.n_item_pairs, r.max_pair_weight) == (0, 0, 0)

    # one butterfly: groups {1,2} x items {10, 11}; cap 1 kills it
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11)], "g long, item long")
    assert butterfly_count(df, "g", "item").collect()[0].n_butterflies == 1
    assert butterfly_count(df, "g", "item", max_group_size=1) \
        .collect()[0].n_butterflies == 0


def test_weighted_sample_bias_and_determinism(spark):
    """E-S priority sampling: (a) deterministic run-to-run; (b) the
    sampled set is weight-biased — the mean weight of the top-k
    beats the population mean on a wide-weight fixture; (c) zero/
    negative weights never drawn."""
    from pyspark.sql import functions as F

    from adopt_spark.functions.sampling import weighted_sample_topk

    rows = [(i, (i % 97) + 1) for i in range(2000)]
    rows += [(9000, 0), (9001, -5)]          # undrawable
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample_topk(df, "doc_id", "w", k=50).collect()
    got2 = weighted_sample_topk(df, "doc_id", "w", k=50).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in got2]
    assert len(got) == 50
    assert all(r["doc_id"] not in (9000, 9001) for r in got)
    mean_sample = sum(r["w"] for r in got) / 50
    mean_pop = sum(w for _, w in rows[:2000]) / 2000
    assert mean_sample > mean_pop * 1.2


def test_negative_samples_properties(spark):
    """Negatives are never real edges or self-pairs; per-src count
    <= k; rerun is identical; every vertex with enough non-neighbor
    candidates gets exactly k."""
    import numpy as np

    from adopt_spark.functions.sampling import negative_samples

    rng = np.random.default_rng(31)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, 30, size=(80, 2))
                    if a != b})
    df = spark.createDataFrame(pairs, "sid long, tid long")
    out = negative_samples(df, k=3, m=8).collect()
    sym = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    for r in out:
        assert (r.src, r.dst) not in sym
        assert r.src != r.dst
    from collections import Counter
    per_src = Counter(r.src for r in out)
    assert all(c <= 3 for c in per_src.values())
    # determinism across reruns
    out2 = negative_samples(df, k=3, m=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_negative_samples_validation(spark):
    import pytest as _pytest

    from adopt_spark.functions.sampling import negative_samples

    df = spark.createDataFrame([(1, 2)], "sid long, tid long")
    with _pytest.raises(ValueError):
        negative_samples(df, k=4, m=2)


def _py_dsir(rows, keep_pct=20, target_lang=None):
    """Pure-python DSIR twin: rows = [(doc_id, lang, text)]."""
    import re
    from collections import Counter

    toks = []
    for doc_id, lang, text in rows:
        for t in re.split(r"\s+", text.strip().lower()):
            if t:
                toks.append((doc_id, lang, t))
    tgt = target_lang or min(lang for _, lang, _ in rows)
    cq = Counter(t for _, _, t in toks)
    cp = Counter(t for _, lang, t in toks if lang == tgt)
    v = len(cq)
    nq = sum(cq.values())
    np_ = sum(cp.values())
    scored = {}
    for doc_id, lang, _ in rows:
        terms = [t for d, _, t in toks if d == doc_id]
        if not terms:
            continue
        llr = [math.log((cp[t] + 1) / (np_ + v))
               - math.log((cq[t] + 1) / (nq + v)) for t in terms]
        scored[doc_id] = (lang, len(terms), round(sum(llr) / len(llr), 6))
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))
    budget = (len(rows) * keep_pct + 99) // 100
    return {d: s for d, s in ranked[:budget]}


def test_dsir_sample_vs_python(spark):
    from adopt_spark.functions.sampling import dsir_sample

    rows = [
        (1, "de", "der hund läuft im park"),
        (2, "de", "die katze schläft auf dem sofa"),
        (3, "de", "der park ist schön im sommer"),
        (4, "en", "the dog runs in the park"),
        (5, "en", "a cat sleeps on the sofa"),
        (6, "en", "parks are nice in summer"),
        (7, "en", "completely unrelated quantum tensor calculus"),
        (8, "en", "der the mixed hund dog text"),
        (9, "de", "im sommer läuft der hund"),
        (10, "en", "sofa sofa sofa sofa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    want = _py_dsir(rows, keep_pct=20)
    got = {r.doc_id: (r.lang, r.n_tokens, r.score)
           for r in dsir_sample(df).collect()}
    assert got == want


def test_dsir_sample_targets_the_target_lang(spark):
    from adopt_spark.functions.sampling import dsir_sample

    rows = [(i, "de" if i % 2 else "en",
             ("der hund läuft" if i % 2 else "the dog runs") + f" x{i}")
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = dsir_sample(df, keep_pct=30).collect()
    # target = 'de' (lexicographic min); the de docs dominate the keep
    assert all(r.lang == "de" for r in kept)
    # keep_pct=100 keeps every doc
    assert dsir_sample(df, keep_pct=100).count() == 20


def test_dsir_sample_validates_pct(spark):
    import pytest as _pytest

    from adopt_spark.functions.sampling import dsir_sample

    df = spark.createDataFrame([(1, "en", "x")],
                               "doc_id long, lang string, text string")
    with _pytest.raises(ValueError):
        dsir_sample(df, keep_pct=0)


def test_sampled_quantiles_error_bound(spark):
    """On a dense uniform distribution the 10% hash-sample quantile
    estimate lands near the exact value; the gate is replayable."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    rows = [(i, float((i * 37) % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {r.probe: r for r in
               R.q_sampled_quantiles(spark, "x").collect()}
    assert set(got) == {"p50", "p90", "p99"}
    n_sample = got["p50"].n_sample
    # ~10% +- sampling noise
    assert 300 < n_sample < 700
    for r in got.values():
        assert r.abs_err == round(abs(r.estimate - r.exact), 6)
        assert r.abs_err < 50          # 5% of the value range
