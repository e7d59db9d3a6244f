"""Multilevel coarsening: python replica differential + structural
invariants (the SQL twin is exercised by the contract gate)."""

from __future__ import annotations

from collections import defaultdict

P = 1_000_000_007
MULT = 2_654_435_761
EDGE_MIX = 2_000_003


def _pri(a, b):
    return (((a % P) * EDGE_MIX + (b % P)) % P) * MULT % P


def _py_match(und, rounds):
    """Fixed-round Luby matching replica (priority = (p, a, b))."""
    act = {(a, b): (_pri(a, b), a, b) for (a, b) in und}
    matched = []
    for _ in range(rounds):
        if not act:
            break
        vmin = {}
        for (a, b), pk in act.items():
            for v in (a, b):
                if v not in vmin or pk < vmin[v]:
                    vmin[v] = pk
        winners = [(a, b) for (a, b), pk in act.items()
                   if vmin[a] == pk and vmin[b] == pk]
        matched.extend(winners)
        mv = {v for e in winners for v in e}
        act = {e: pk for e, pk in act.items()
               if e[0] not in mv and e[1] not in mv}
    return matched


def _py_coarsen(pairs, levels, rounds):
    und = defaultdict(int)
    for a, b in pairs:
        if a != b:
            und[(min(a, b), max(a, b))] = 0
    und = {e: 1 for e in und}

    def summ(lvl, g):
        vs = {v for e in g for v in e}
        return (lvl, len(vs), len(g), sum(g.values()))

    out = [summ(0, und)]
    for lvl in range(1, levels + 1):
        m = _py_match(sorted(und), rounds)
        sv = {}
        for a, b in m:
            sv[b] = a
        nxt = defaultdict(int)
        for (a, b), w in und.items():
            sa, sb = sv.get(a, a), sv.get(b, b)
            if sa != sb:
                nxt[(min(sa, sb), max(sa, sb))] += w
        und = dict(nxt)
        out.append(summ(lvl, und))
    return out


def test_coarsen_matches_python(spark, two_components):
    from adopt_spark.algos.coarsen import coarsen_graph

    edges, pairs = two_components
    got = [(r.level, r.n_vertices, r.n_edges, r.total_weight)
           for r in coarsen_graph(edges, levels=3, rounds=12).collect()]
    assert got == _py_coarsen(pairs, 3, 12)


def test_coarsen_invariants(spark, tri6):
    from adopt_spark.algos.coarsen import coarsen_graph

    edges, _ = tri6
    rows = coarsen_graph(edges, levels=2, rounds=8).collect()
    assert [r.level for r in rows] == [0, 1, 2]
    for prev, cur in zip(rows, rows[1:]):
        # contraction merges disjoint pairs: vertex count can at most
        # halve, never grow; weight only leaves via absorbed self-loops
        assert cur.n_vertices <= prev.n_vertices
        assert cur.n_vertices >= prev.n_vertices // 2
        assert cur.total_weight <= prev.total_weight
        assert cur.n_edges <= prev.n_edges


def test_coarsen_single_edge_collapses(spark):
    from adopt_spark.algos.coarsen import coarsen_graph

    from tests.conftest import edge_df

    e = edge_df(spark, [(1, 2)])
    rows = coarsen_graph(e, levels=1, rounds=4).collect()
    assert (rows[0].level, rows[0].n_vertices, rows[0].n_edges) == (0, 2, 1)
    # the pair matches, contracts to one isolated supervertex: empty graph
    assert (rows[1].n_vertices, rows[1].n_edges,
            rows[1].total_weight) == (0, 0, 0)


def test_coarsen_validation(spark, tri6):
    import pytest

    from adopt_spark.algos.coarsen import coarsen_graph

    edges, _ = tri6
    with pytest.raises(ValueError):
        coarsen_graph(edges, levels=0)
