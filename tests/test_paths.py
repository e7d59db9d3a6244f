"""Shortest paths (BFS + weighted SSSP) vs a pure-python Dijkstra."""

from __future__ import annotations

import heapq

import pytest

from adopt_spark.algos.paths import bfs_hops, shortest_paths


def py_dijkstra(pairs, source, weight=None, directed=True):
    adj: dict[int, list[tuple[int, int]]] = {}
    seen = set()
    for a, b in pairs:
        links = [(a, b)] if directed else [(a, b), (b, a)]
        for u, v in links:
            if u != v and (u, v) not in seen:
                seen.add((u, v))
                w = weight(u, v) if weight else 1
                adj.setdefault(u, []).append((v, w))
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def contract_w(u, v):
    return 1 + (u * 7 + v * 13) % 10


def _got(df):
    return {int(r["v"]): int(r["dist"]) for r in df.collect()}


def test_bfs_hops_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    dist, metrics = bfs_hops(spark, edges, 0)
    expected = py_dijkstra(pairs, 0, directed=False)
    assert _got(dist) == expected
    assert metrics[-1]["frontier"] == 0


def test_bfs_unreached_absent(spark, two_components):
    edges, pairs = two_components
    dist, _ = bfs_hops(spark, edges, 0)
    got = _got(dist)
    assert got == py_dijkstra(pairs, 0, directed=False)
    assert all(v < 100 for v in got)  # second component absent, not inf


def test_bfs_directed_chain(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (5, 2)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    dist, _ = shortest_paths(spark, edges, 0, directed=True)
    assert _got(dist) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_weighted_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    dist, _ = shortest_paths(spark, edges, 0, weighted=True, directed=False)
    # undirected contract weights are asymmetric per direction — the
    # python oracle mirrors the engine's symmetrized directed relation
    dpairs = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    expected = py_dijkstra(dpairs, 0, weight=contract_w, directed=True)
    assert _got(dist) == expected


def test_sssp_weighted_beats_hop_path(spark):
    # direct edge 0->3 weight contract_w(0,3)=1+39%10=10; the 3-hop
    # path 0->10->11->3 costs less if weights align; verify Bellman-
    # Ford picks the cheaper multi-hop route over the 1-hop one.
    pairs = [(0, 3), (0, 10), (10, 11), (11, 3)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    dist, _ = shortest_paths(spark, edges, 0, weighted=True, directed=True)
    expected = py_dijkstra(pairs, 0, weight=contract_w, directed=True)
    assert _got(dist) == expected


def test_sssp_resume_matches_fresh(spark, powerlaw_small, tmp_path):
    edges, _ = powerlaw_small
    ck = str(tmp_path / "ck")
    full, _ = shortest_paths(spark, edges, 0, weighted=True,
                             directed=False, checkpoint_dir=ck)
    resumed, metrics = shortest_paths(spark, edges, 0, weighted=True,
                                      directed=False, checkpoint_dir=ck,
                                      resume=True)
    assert _got(resumed) == _got(full)
    # resume restarts from the converged snapshot: one no-op round
    assert len(metrics) == 1 and metrics[0]["frontier"] == 0


def test_bfs_rounds_within_oracle_budget(spark, powerlaw_small):
    """The unrolled-oracle budgets must dominate engine convergence."""
    from adopt_spark.queries.oracle_gen import BFS_ROUNDS, SSSP_ROUNDS

    edges, _ = powerlaw_small
    _, m_bfs = bfs_hops(spark, edges, 0)
    _, m_sssp = shortest_paths(spark, edges, 0, weighted=True, directed=False)
    assert len(m_bfs) <= BFS_ROUNDS
    assert len(m_sssp) <= SSSP_ROUNDS


def test_multi_source_bfs(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    seeds = [0, 50, 100]
    dist, _ = bfs_hops(spark, edges, seeds)
    per_seed = [py_dijkstra(pairs, s, directed=False) for s in seeds]
    verts = set().union(*[d.keys() for d in per_seed])
    expected = {v: min(d.get(v, 10**9) for d in per_seed) for v in verts}
    assert _got(dist) == expected


def test_multi_source_equals_single_when_one_seed(spark, powerlaw_small):
    edges, _ = powerlaw_small
    a, _ = bfs_hops(spark, edges, 0)
    b, _ = bfs_hops(spark, edges, [0])
    assert _got(a) == _got(b)


def test_sssp_tree_parents_walk_back_to_seed(spark, powerlaw_small):
    from adopt_spark.algos.paths import shortest_path_tree

    edges, pairs = powerlaw_small
    tree, _ = shortest_path_tree(spark, edges, 0, weighted=True,
                                 directed=False)
    rows = {int(r["v"]): (int(r["dist"]),
                          None if r["parent"] is None else int(r["parent"]))
            for r in tree.collect()}
    dpairs = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    expected = py_dijkstra(dpairs, 0, weight=contract_w, directed=True)
    assert {v: d for v, (d, _) in rows.items()} == expected
    # seed has no parent; every other parent is the MIN relaxation
    # witness, and walking parents accumulates exactly dist(v)
    assert rows[0][1] is None
    for v, (d, p) in rows.items():
        if v == 0:
            continue
        witnesses = [u for u, (du, _) in rows.items()
                     if (u, v) in {(a, b) for a, b in dpairs}
                     and du + contract_w(u, v) == d]
        assert p == min(witnesses)
    # parent chains terminate at the seed (acyclic tree)
    for v in rows:
        hops, cur = 0, v
        while rows[cur][1] is not None:
            cur = rows[cur][1]
            hops += 1
            assert hops <= len(rows)
        assert cur == 0


def test_sssp_tree_partition_invariance(spark):
    from adopt_spark.algos.paths import shortest_path_tree

    pairs = [(0, 3), (0, 10), (10, 11), (11, 3), (3, 7), (10, 7)]
    e1 = spark.createDataFrame(pairs, "sid long, tid long").repartition(1)
    ek = spark.createDataFrame(pairs, "sid long, tid long").repartition(7)
    a, _ = shortest_path_tree(spark, e1, 0, weighted=True, directed=True)
    b, _ = shortest_path_tree(spark, ek, 0, weighted=True, directed=True)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(a) == key(b)


def py_pivot_bfs(pairs, n_pivots, directed=True):
    verts = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    out = {}
    for p in verts[:n_pivots]:
        dist = {p: 0}
        frontier = [p]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            out[(p, v)] = d
    return out


def test_pivot_distances_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.paths import pivot_distances

    edges, pairs = powerlaw_small
    got = {(r.pivot_id, r.v): r.dist
           for r in pivot_distances(spark, edges, 3, directed=True).collect()}
    assert got == py_pivot_bfs(pairs, 3, directed=True)


def test_eccentricity_and_harmonic(spark):
    from adopt_spark.algos.paths import (eccentricity_profile,
                                         harmonic_centrality)

    # 0->1->2->3 chain plus 1->3 shortcut; pivots (k=2) are 0 and 1
    pairs = [(0, 1), (1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    ecc = {r.pivot_id: (r.ecc, r.n_reached)
           for r in eccentricity_profile(spark, edges, 2).collect()}
    # from 0: d={0:0,1:1,2:2,3:2}; from 1: d={1:0,2:1,3:1}
    assert ecc == {0: (2, 4), 1: (1, 3)}
    har = {r.v: r.harmonic
           for r in harmonic_centrality(spark, edges, 2).collect()}
    assert har == {1: 1.0, 2: round(1 / 2 + 1, 6), 3: round(1 / 2 + 1, 6)}


def test_pivot_rounds_within_oracle_budget(spark, powerlaw_small):
    # the contract oracle unrolls 16 rounds; the engine must converge
    # in fewer on the contract fixture (measured max ecc 8 at sf0.001)
    from adopt_spark.algos.paths import pivot_distances
    from adopt_spark.edges import derived_edges

    d = pivot_distances(
        spark, derived_edges(spark, "/root/testdata/sf0.001"), 4,
        directed=True)
    assert d.agg({"dist": "max"}).collect()[0][0] < 16


def _py_widest(pairs, source, directed=True):
    """Fixpoint max-min relaxation with contract weights."""
    rel = {}
    es = {(a, b) for a, b in pairs}
    if not directed:
        es |= {(b, a) for a, b in pairs}
    for a, b in es:
        if a != b:
            rel[(a, b)] = 1 + (a * 7 + b * 13) % 10
    width = {source: 1 << 60}
    changed = True
    while changed:
        changed = False
        for (u, v), w in rel.items():
            if u in width:
                nw = min(width[u], w)
                if nw > width.get(v, -1):
                    width[v] = nw
                    changed = True
    width.pop(source, None)
    return width


def test_widest_paths_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.paths import widest_paths

    df, pairs = powerlaw_small
    src = min(a for a, _ in pairs)
    want = _py_widest(pairs, src, directed=False)
    got, metrics = widest_paths(spark, df, src, directed=False)
    assert {r.v: r.width for r in got.collect()} == want
    assert metrics[-1]["frontier"] == 0  # ran to fixpoint


def test_widest_paths_bottleneck_law(spark):
    from adopt_spark.algos.paths import widest_paths

    # chain 0->1->2 vs direct 0->2: width of 2 = max(min-edge of the
    # two routes) computed from the contract weights
    pairs = [(0, 1), (1, 2), (0, 2)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    w01 = 1 + (0 * 7 + 1 * 13) % 10
    w12 = 1 + (1 * 7 + 2 * 13) % 10
    w02 = 1 + (0 * 7 + 2 * 13) % 10
    got = {r.v: r.width for r in
           widest_paths(spark, df, 0, directed=True)[0].collect()}
    assert got[2] == max(w02, min(w01, w12))
    assert got[1] == w01


def test_relabel_bandwidth_on_a_path_graph(spark):
    """BFS relabeling of a scrambled path graph recovers bandwidth 1
    (consecutive labels along the path) from a big original
    bandwidth."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    # path over scrambled ids: bandwidth_before is large, after = 1
    ids = [5, 900, 17, 3000, 42, 77, 12345, 8]
    pairs = [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    with mock.patch.object(R, "derived_edges_sparse",
                           lambda s_, sf: df):
        row = R.q_relabel_bandwidth(spark, "x").collect()[0]
    assert row.n_reached == len(ids)
    assert row.n_edges == len(pairs)
    assert row.bw_before == max(abs(a - b) for a, b in pairs)
    # BFS from min id (5) walks the path in order -> consecutive ranks
    assert row.bw_after == 1


def test_bfs_profile_star_and_chain(spark):
    """Wavefront histogram on star-plus-chain: level sizes by hand."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    pairs = [(0, i) for i in range(1, 6)] + [(5, 10), (10, 11)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    with mock.patch.object(R, "derived_edges_sparse",
                           lambda s_, sf: df):
        got = {r.hop: r.n_vertices
               for r in R.q_bfs_profile(spark, "x").collect()}
    # from 0: hop0={0}, hop1={1..5}, hop2={10}, hop3={11}
    assert got == {0: 1, 1: 5, 2: 1, 3: 1}
