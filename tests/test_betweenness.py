"""Pivot-set betweenness vs a pure-python Brandes implementation."""

from __future__ import annotations

from collections import deque

import pytest

from adopt_spark.algos.betweenness import betweenness_from_pivots


def py_brandes(pairs, pivots):
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in sorted(set(pairs)):
        if a != b:
            adj.setdefault(a, []).append(b)
            verts.update((a, b))
    bc = {v: 0.0 for v in verts}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0) + sigma[u]
        delta = {v: 0.0 for v in order}
        for u in reversed(order):
            for v in adj.get(u, []):
                if dist.get(v) == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if u != s:
                bc[u] += delta[u]
    return bc


def _got(df):
    return {int(r["v"]): float(r["bc"]) for r in df.collect()}


def test_betweenness_path_graph(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    out, _ = betweenness_from_pivots(spark, edges, [0])
    got = _got(out)
    # from pivot 0: vertex 1 lies on paths to 2 and 3; vertex 2 on one
    assert got == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_diamond_split_paths(spark):
    # 0->1->3, 0->2->3: two shortest paths; 1 and 2 each carry half
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    out, _ = betweenness_from_pivots(spark, edges, [0])
    got = _got(out)
    expect = py_brandes(pairs, [0])
    for v, x in expect.items():
        assert got[v] == pytest.approx(x)
    assert got[1] == pytest.approx(1.0)  # 0.5 (to 3) + 0.5 (to 4)
    assert got[3] == pytest.approx(1.0)


def test_betweenness_powerlaw_multi_pivot(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    pivots = [0, 1, 2, 7]
    out, metrics = betweenness_from_pivots(spark, edges, pivots)
    expect = py_brandes(pairs, pivots)
    got = _got(out)
    assert set(got) == set(expect)
    for v, x in expect.items():
        assert got[v] == pytest.approx(x, abs=1e-9)
    assert [m["pivot"] for m in metrics] == pivots
