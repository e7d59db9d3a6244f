"""Differential tests: bipartite check, join-size profiling, dup spans."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from adopt_spark.algos.bipartite import bipartite_check
from adopt_spark.functions.cardinality import join_size_profile
from adopt_spark.functions.text import dup_span_stats
from tests.conftest import edge_df


def _bipartite_python(pairs):
    """BFS 2-coloring from each component's min vertex (the module's
    root convention); returns {component: (n_vertices, n_conflicts)}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: dict[int, tuple[int, int]] = {}   # v -> (component, dist)
    out = {}
    for root in sorted(adj):
        if root in seen:
            continue
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        conf = sum(
            1 for u in dist for w in adj[u]
            if u < w and dist[u] % 2 == dist[w] % 2)
        for v, d in dist.items():
            seen[v] = (root, d)
        out[root] = (len(dist), conf)
    return out


def _report(spark, pairs):
    got = bipartite_check(spark, edge_df(spark, pairs)).collect()
    return {r.component: (r.n_vertices, r.is_bipartite, r.n_conflict_edges)
            for r in got}


def test_bipartite_even_cycle(spark):
    rep = _report(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert rep == {0: (6, True, 0)}


def test_bipartite_odd_cycle(spark):
    rep = _report(spark, [(i, (i + 1) % 5) for i in range(5)])
    assert rep == {0: (5, False, 1)}


def test_bipartite_mixed_components(spark):
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    tri = [(10, 11), (11, 12), (12, 10)]
    path = [(20, 21), (21, 22)]
    rep = _report(spark, square + tri + path)
    assert rep == {0: (4, True, 0), 10: (3, False, 1), 20: (3, True, 0)}


def test_bipartite_differential_random(spark):
    # deterministic pseudo-random multigraph incl. parallel/self edges
    pairs = [((i * 17) % 23, (i * i * 7 + 3) % 23) for i in range(60)]
    want = _bipartite_python(pairs)
    rep = _report(spark, pairs)
    assert set(rep) == set(want)
    for comp, (nv, conf) in want.items():
        assert rep[comp] == (nv, conf == 0, conf)


def test_join_size_profile_differential(spark):
    left = spark.createDataFrame(
        [(i % 40, i) for i in range(600)], "k long, x long")
    right = spark.createDataFrame(
        [(i % 55, i) for i in range(200)], "k long, y long")
    prof = {r.join_name: r for r in join_size_profile(
        [("lr", left, "k", right, "k")]).collect()}["lr"]
    actual = left.join(right, "k").count()
    assert prof.est_rows == actual
    # hot-key share matches a direct computation
    per_key = (left.groupBy("k").count().withColumnRenamed("count", "ca")
               .join(right.groupBy("k").count()
                     .withColumnRenamed("count", "cb"), "k")
               .select((F.col("ca") * F.col("cb")).alias("p")).collect())
    prods = [r.p for r in per_key]
    assert prof.n_match_keys == len(prods)
    assert abs(prof.top_key_share - max(prods) / sum(prods)) < 1e-6


def test_join_size_profile_empty_match(spark):
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(99,)], "k long")
    r = join_size_profile([("none", left, "k", right, "k")]).collect()[0]
    assert (r.est_rows, r.n_match_keys, r.top_key_share) == (0, 0, 0.0)


def test_dup_spans_handcrafted(spark):
    boiler = "a b c d e f g h i j"          # 10 tokens
    docs = [
        (0, boiler + " unique0 text zero"),  # shares 10-token prefix
        (1, boiler + " unique1 word one"),
        (2, "nothing shared here at all beyond short runs x2"),
        (3, ""),                             # empty doc -> zeros
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    rep = {r.doc_id: r for r in dup_span_stats(ddf, n=8).collect()}
    # docs 0/1: the shared 10-token region duplicates shingles at
    # starts 0,1,2 -> one maximal span [0, 9] = 10 tokens
    for d in (0, 1):
        assert (rep[d].n_spans, rep[d].dup_tokens) == (1, 10)
        assert abs(rep[d].dup_frac - 10 / rep[d].n_tokens) < 1e-6
    assert (rep[2].n_spans, rep[2].dup_tokens) == (0, 0)
    assert (rep[3].n_spans, rep[3].dup_tokens, rep[3].n_tokens) == (0, 0, 0)


def test_dup_spans_two_disjoint_spans(spark):
    s1 = "p q r s t u v w"                   # 8 tokens
    s2 = "k l m n o aa bb cc"                # 8 tokens
    docs = [
        (0, f"{s1} gapx gapy gapz {s2}"),
        (1, f"{s1} other filler words {s2} trailing"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    rep = {r.doc_id: r for r in dup_span_stats(ddf, n=8).collect()}
    for d in (0, 1):
        assert (rep[d].n_spans, rep[d].dup_tokens) == (2, 16)


def test_dup_spans_partition_invariance(spark):
    docs = [(i, "shared prefix tokens one two three four five six"
             + f" tail{i % 3}") for i in range(30)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, dup_span_stats(ddf.repartition(1), n=8).collect()))
    b = sorted(map(tuple, dup_span_stats(ddf.repartition(9), n=8).collect()))
    assert a == b
