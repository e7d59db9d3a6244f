"""Differential tests for bridge detection (algos/bridges.py).

Twin: an independent iterative Tarjan low-link bridge finder — a
different algorithm family from the engine's BFS-forest +
fundamental-cycle cover, so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import edge_df


def tarjan_bridges(pairs):
    """Iterative Tarjan low-link; returns {(min, max), ...}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    out = set()
    t = [0]
    for root in sorted(adj):
        if root in disc:
            continue
        stack = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = t[0]
        t[0] += 1
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w == parent:
                    # skip the tree edge back to the parent exactly
                    # once (the graph is simple: no multi-edges)
                    parent = None
                    stack[-1] = (v, None, it)
                    continue
                if w not in disc:
                    disc[w] = low[w] = t[0]
                    t[0] += 1
                    stack.append((w, v, iter(sorted(adj[w]))))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] > disc[p]:
                        out.add((min(p, v), max(p, v)))
        pass
    return out


def _run(spark, pairs):
    from adopt_spark.algos.bridges import bridge_report

    got = bridge_report(spark, edge_df(spark, pairs)).collect()
    return {(r.u, r.v) for r in got}


def test_bridges_hand_graph(spark):
    # two triangles joined by one edge (bridge), a pendant (bridge),
    # and a disconnected 4-cycle (no bridges)
    pairs = [(0, 1), (1, 2), (0, 2),          # triangle A
             (2, 3),                           # bridge
             (3, 4), (4, 5), (3, 5),           # triangle B
             (5, 6),                           # pendant bridge
             (10, 11), (11, 12), (12, 13), (10, 13)]  # 4-cycle
    assert _run(spark, pairs) == {(2, 3), (5, 6)}


def test_bridges_path_and_single_edge(spark):
    # a bare path: every edge is a bridge
    pairs = [(i, i + 1) for i in range(6)]
    assert _run(spark, pairs) == {(i, i + 1) for i in range(6)}
    assert _run(spark, [(7, 9)]) == {(7, 9)}


def test_bridges_empty_and_cycle(spark):
    from adopt_spark.algos.bridges import bridge_report

    empty = edge_df(spark, [])
    assert bridge_report(spark, empty).count() == 0
    # a single cycle has no bridges
    ring = [(i, (i + 1) % 8) for i in range(8)]
    assert _run(spark, ring) == set()


@pytest.mark.parametrize("seed", [0, 1])
def test_bridges_random_vs_tarjan(spark, seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 75
    pairs = set()
    while len(pairs) < m:
        a, b = rng.integers(0, n, size=2)
        if a != b:
            pairs.add((int(min(a, b)), int(max(a, b))))
    pairs = sorted(pairs)
    assert _run(spark, pairs) == tarjan_bridges(pairs)


def test_bridges_partition_invariance(spark):
    from adopt_spark.algos.bridges import bridge_report

    rng = np.random.default_rng(3)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 40, size=(60, 2))
                    if a != b})
    e = edge_df(spark, pairs)
    one = {(r.u, r.v)
           for r in bridge_report(spark, e.repartition(1)).collect()}
    many = {(r.u, r.v)
            for r in bridge_report(spark, e.repartition(7)).collect()}
    assert one == many == tarjan_bridges(pairs)


def test_two_edge_connected_sizes_vs_twin(spark):
    from adopt_spark.algos.bridges import two_edge_connected_sizes

    rng = np.random.default_rng(5)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 50, size=(70, 2))
                    if a != b})
    got = {(r.size, r.n_components)
           for r in two_edge_connected_sizes(
               spark, edge_df(spark, pairs)).collect()}

    # twin: tarjan bridges -> union-find on the rest
    br = tarjan_bridges(pairs)
    verts = sorted({x for p in pairs for x in p})
    parent = {v: v for v in verts}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        if (a, b) not in br:
            parent[find(a)] = find(b)
    from collections import Counter
    comp_sizes = Counter(find(v) for v in verts)
    want = set(Counter(comp_sizes.values()).items())
    assert got == {(s, n) for s, n in want}


def test_two_edge_connected_ring_plus_pendant(spark):
    from adopt_spark.algos.bridges import two_edge_connected_sizes

    # 5-ring with a pendant: one 2ECC of size 5, one singleton
    pairs = [(i, (i + 1) % 5) for i in range(5)] + [(0, 9)]
    got = {(r.size, r.n_components)
           for r in two_edge_connected_sizes(
               spark, edge_df(spark, pairs)).collect()}
    assert got == {(5, 1), (1, 1)}
