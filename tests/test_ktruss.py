"""k-truss decomposition vs a pure-python support peel."""

from __future__ import annotations

import numpy as np

from adopt_spark.algos.ktruss import edge_supports, truss_numbers


def py_truss(pairs, k_cap=30):
    es = {(a, b) for a, b in pairs if a < b}
    truss = {e: 2 for e in es}
    cur = set(es)
    k = 3
    while cur and k <= k_cap:
        while True:
            adj: dict[int, set[int]] = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {e: len(adj[e[0]] & adj[e[1]]) for e in cur}
            drop = {e for e in cur if sup[e] < k - 2}
            if not drop:
                break
            cur -= drop
        for e in cur:
            truss[e] = k
        k += 1
    return truss


def _got(df):
    return {(int(r["sid"]), int(r["tid"])): int(r["truss"])
            for r in df.collect()}


def test_truss_tri6(spark, tri6):
    edges, pairs = tri6
    out, _ = truss_numbers(spark, edges)
    # both triangles are 3-trusses; the 1-5/4-5 square edges stay at 2
    assert _got(out) == py_truss(pairs)


def test_truss_clique_plus_tail(spark):
    # K5 is a 5-truss (every edge in 3 triangles); pendant edge stays 2
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)] + [(4, 99)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    out, metrics = truss_numbers(spark, edges)
    got = _got(out)
    assert got[(4, 99)] == 2
    assert all(got[e] == 5 for e in got if e != (4, 99))


def test_truss_cascade(spark):
    # triangle fan where removing the weakest edge cascades: two
    # triangles sharing an edge + a bridge triangle
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5),
             (5, 6), (4, 6)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    out, _ = truss_numbers(spark, edges)
    assert _got(out) == py_truss(pairs)


def test_truss_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    out, _ = truss_numbers(spark, edges)
    assert _got(out) == py_truss(pairs)


def test_edge_supports_matches_python(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    es = {(a, b) for a, b in pairs if a < b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
    expect = {e: s for e, s in expect.items() if s > 0}
    got = {(int(r["sid"]), int(r["tid"])): int(r["support"])
           for r in edge_supports(edges).collect()}
    assert got == expect


def test_truss_delta_equals_full(spark, powerlaw_small, tri6):
    """The delta-support peel (default) must be row-identical to the
    full per-round recompute on every fixture shape."""
    for edges, _ in (powerlaw_small, tri6):
        full, _ = truss_numbers(spark, edges, method="full")
        delta, _ = truss_numbers(spark, edges, method="delta")
        assert _got(full) == _got(delta)


def test_truss_delta_does_one_enumeration(spark, powerlaw_small):
    """Delta metrics expose drop-proportional rounds (every round
    records its dropped count); the peel converges to the same
    fixpoint edge counts as the full plan."""
    edges, _ = powerlaw_small
    _, mfull = truss_numbers(spark, edges, method="full")
    _, mdelta = truss_numbers(spark, edges, method="delta")
    assert all("dropped" in m for m in mdelta)
    # final surviving edge count per k stage agrees
    def final_edges(ms):
        out = {}
        for m in ms:
            out[m["k"]] = m["edges"]
        return out
    f, d = final_edges(mfull), final_edges(mdelta)
    for k in set(f) & set(d):
        assert f[k] == d[k]
