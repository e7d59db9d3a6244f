"""Deterministic Luby MIS vs a pure-python twin + set invariants."""

import numpy as np

from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME, luby_mis
from tests.conftest import edge_df


def python_mis(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    und = set(adj)
    pri = lambda x: ((x % MIS_PRIME) * MIS_MULT % MIS_PRIME, x)
    mis = set()
    while und:
        new = {v for v in und
               if all(pri(v) < pri(u) for u in adj[v] if u in und)}
        mis |= new
        knocked = set().union(*(adj[v] for v in new)) & und
        und -= new | knocked
    return mis, adj


def check(spark, pairs):
    got = {r["v"] for r in luby_mis(edge_df(spark, pairs)).collect()}
    exp, adj = python_mis(pairs)
    assert got == exp
    # independence: no edge inside the MIS
    for v in got:
        assert not (adj[v] & got)
    # maximality: every non-member has a MIS neighbor
    for v in set(adj) - got:
        assert adj[v] & got


def test_mis_small_fixtures(spark):
    check(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4),
                  (1, 5), (4, 5)])
    check(spark, [(i, i + 1) for i in range(20)])          # path
    check(spark, [(i, (i + 1) % 12) for i in range(12)])   # even cycle
    check(spark, [(0, i) for i in range(1, 15)])           # star


def test_mis_random_graph(spark):
    rng = np.random.default_rng(7)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 60, (300, 2))
             if p[0] != p[1]}
    check(spark, sorted(pairs))


def test_mis_empty(spark):
    out = luby_mis(edge_df(spark, []))
    assert out.count() == 0 and out.columns == ["v"]


def test_coloring_proper_and_matches_python(spark):
    from adopt_spark.algos.mis import greedy_coloring

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (1, 5),
             (4, 5), (5, 6), (6, 0)]
    got = {r["v"]: r["color"] for r in
           greedy_coloring(edge_df(spark, pairs)).collect()}

    # python twin: peel deterministic MIS classes
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    unc = set(adj)
    pri = lambda x: ((x % MIS_PRIME) * MIS_MULT % MIS_PRIME, x)
    exp, c = {}, 0
    while unc:
        und, mis = set(unc), set()
        while und:
            new = {v for v in und
                   if all(pri(v) < pri(u) for u in adj[v] if u in und)}
            mis |= new
            knocked = (set().union(*(adj[v] for v in new)) & und
                       if new else set())
            und -= new | knocked
        for v in mis:
            exp[v] = c
        unc -= mis
        c += 1
    assert got == exp
    for a, b in pairs:                 # proper coloring
        assert got[a] != got[b]


def test_coloring_star_two_colors(spark):
    from adopt_spark.algos.mis import greedy_coloring

    out = greedy_coloring(edge_df(spark, [(0, i) for i in range(1, 12)]))
    colors = {r["v"]: r["color"] for r in out.collect()}
    assert len(set(colors.values())) == 2
