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


# -------------------------------------------- multilevel partition


def _py_partition(pairs, k, levels, rounds):
    und = {(min(a, b), max(a, b)): 1 for a, b in pairs if a != b}
    verts = sorted({v for e in und for v in e})
    maps = []
    g = dict(und)
    for _ in range(levels):
        m = _py_match(sorted(g), rounds)
        sv = {b: a for a, b in m}
        maps.append(sv)
        nxt = defaultdict(int)
        for (a, b), w in g.items():
            sa, sb = sv.get(a, a), sv.get(b, b)
            if sa != sb:
                nxt[(min(sa, sb), max(sa, sb))] += w
        g = dict(nxt)
    proj = {}
    for v in verts:
        sv = v
        for mp in maps:
            sv = mp.get(sv, sv)
        proj[v] = sv

    def rep(name, assign):
        cut = sum(w for (a, b), w in und.items()
                  if assign[a] != assign[b])
        tot = sum(und.values())
        parts = defaultdict(int)
        for v in verts:
            parts[assign[v]] += 1
        return (name, cut, tot, round(cut / tot, 6), max(parts.values()))

    return sorted([rep("coarsen_project", {v: proj[v] % k for v in verts}),
                   rep("hash_direct", {v: v % k for v in verts})])


def test_multilevel_partition_matches_python(spark, two_components):
    from adopt_spark.algos.coarsen import multilevel_partition

    edges, pairs = two_components
    got = sorted((r.strategy, r.cut_weight, r.total_weight, r.cut_frac,
                  r.max_part)
                 for r in multilevel_partition(edges, k=3, levels=2,
                                               rounds=12).collect())
    assert got == _py_partition(pairs, 3, 2, 12)


def test_multilevel_beats_hash_on_local_graph(spark):
    """On an id-local ring-of-cliques graph the projected cascade cut
    must beat the direct hash cut decisively — the measured value of
    coarsening (on hash-random graphs the two roughly tie)."""
    from adopt_spark.algos.coarsen import multilevel_partition

    from tests.conftest import edge_df

    pairs = []
    n_cliques, csize = 40, 5
    for c in range(n_cliques):
        base = c * csize
        for i in range(csize):
            for j in range(i + 1, csize):
                pairs.append((base + i, base + j))
        pairs.append((base + csize - 1, (base + csize) %
                      (n_cliques * csize)))
    rows = {r.strategy: r for r in multilevel_partition(
        edge_df(spark, pairs), k=4, levels=3, rounds=12).collect()}
    assert rows["coarsen_project"].cut_frac < rows["hash_direct"].cut_frac

    # weight accounting: cut <= total, identical totals across strategies
    assert (rows["coarsen_project"].total_weight
            == rows["hash_direct"].total_weight)
    for r in rows.values():
        assert 0 <= r.cut_weight <= r.total_weight
