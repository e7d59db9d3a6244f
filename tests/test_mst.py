"""Borůvka spanning forest vs a pure-python Kruskal twin + invariants.

With distinct weights the MSF is unique, so Borůvka (the engine's
round schedule) and Kruskal (the twin) must agree edge-for-edge;
every fixture's hash weights are asserted distinct so the comparison
is sound.
"""

import numpy as np

from adopt_spark.algos.matching import MATCH_EDGE_MIX
from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME
from adopt_spark.algos.mst import boruvka_forest
from tests.conftest import edge_df


def hash_w(a, b):
    pkey = ((a % MIS_PRIME) * MATCH_EDGE_MIX + (b % MIS_PRIME)) % MIS_PRIME
    return pkey * MIS_MULT % MIS_PRIME


def python_kruskal(pairs):
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    ws = [hash_w(a, b) for a, b in edges]
    assert len(set(ws)) == len(ws), "fixture must have distinct weights"
    parent = {v: v for e in edges for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, a, b in sorted(zip(ws, *zip(*edges))) if edges else []:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest, edges, parent


def check(spark, pairs):
    got = {(r["a"], r["b"], r["w"])
           for r in boruvka_forest(edge_df(spark, pairs)).collect()}
    exp, edges, parent = python_kruskal(pairs)
    assert got == exp
    # spanning forest size: |V| - #components
    verts = {v for e in edges for v in e}
    roots = set()
    for v in verts:
        x = v
        while parent[x] != x:
            x = parent[x]
        roots.add(x)
    assert len(got) == len(verts) - len(roots)


def test_mst_small_fixtures(spark):
    check(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4),
                  (1, 5), (4, 5)])
    check(spark, [(i, i + 1) for i in range(21)])          # path: all edges
    check(spark, [(0, i) for i in range(1, 15)])           # star: all edges
    # two disconnected triangles -> forest of 2+2 edges
    check(spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)])


def test_mst_random_graph(spark):
    rng = np.random.default_rng(7)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 80, (400, 2))
             if p[0] != p[1]}
    check(spark, sorted(pairs))


def test_mst_directed_dup_input(spark):
    # duplicate + reversed edges and self-loops collapse first
    check(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3), (3, 2)])


def test_mst_empty(spark):
    out = boruvka_forest(edge_df(spark, []))
    assert out.count() == 0 and out.columns == ["a", "b", "w"]
