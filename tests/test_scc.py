"""SCC coloring vs a pure-python Tarjan oracle."""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.algos.scc import strongly_connected_components


def py_scc(pairs):
    """Iterative Tarjan; returns {v: min_member_of_scc}."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, []).append(b)
            verts.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return comp


def _run(spark, pairs):
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "sid long, tid long")
    labels, metrics = strongly_connected_components(spark, edges)
    return {int(r["v"]): int(r["comp"]) for r in labels.collect()}, metrics


def test_scc_two_cycles_and_dag(spark):
    # cycle {0,1,2}, cycle {5,6}, DAG tail 2->3->4, cross edge 6->0
    pairs = [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5), (2, 3), (3, 4), (6, 0)]
    got, _ = _run(spark, pairs)
    assert got == py_scc(pairs)
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == 5
    assert got[3] == 3 and got[4] == 4


def test_scc_nested_dag_of_cycles(spark):
    # chain of 5 cycles linked acyclically — exercises outer peeling
    pairs = []
    for k in range(5):
        base = 10 * k
        pairs += [(base, base + 1), (base + 1, base + 2), (base + 2, base)]
        if k:
            pairs.append((base - 10, base))
    got, metrics = _run(spark, pairs)
    assert got == py_scc(pairs)
    assert len({c for c in got.values()}) == 5


def test_scc_random_directed(spark):
    rng = np.random.default_rng(7)
    n = 60
    pairs = {(int(a), int(b))
             for a, b in rng.integers(0, n, size=(240, 2)) if a != b}
    got, _ = _run(spark, sorted(pairs))
    assert got == py_scc(sorted(pairs))


def test_scc_pure_dag_all_singletons(spark):
    pairs = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    got, _ = _run(spark, pairs)
    assert got == {v: v for v in range(8)}


def test_bowtie_decomposition_hand_graph(spark):
    from adopt_spark.algos.scc import bowtie_decomposition

    # core SCC {10,11,12}; IN: 1 -> 10, 0 -> 1; OUT: 12 -> 20 -> 21;
    # tendril off IN: 1 -> 30 (reaches OUT? no: 30 is a dead end ->
    # "other"); disconnected pair 40 -> 41
    pairs = [(10, 11), (11, 12), (12, 10),
             (1, 10), (0, 1),
             (12, 20), (20, 21),
             (1, 30),
             (40, 41)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    r = bowtie_decomposition(spark, edges).collect()[0]
    assert r.n_vertices == 10
    assert r.core_size == 3            # {10,11,12}
    assert r.in_size == 2              # {0,1}
    assert r.out_size == 2             # {20,21}
    assert r.other_size == 3           # {30,40,41}


def test_bowtie_all_one_scc(spark):
    from adopt_spark.algos.scc import bowtie_decomposition

    ring = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(ring, "sid long, tid long")
    r = bowtie_decomposition(spark, edges).collect()[0]
    assert (r.n_vertices, r.core_size, r.in_size, r.out_size,
            r.other_size) == (5, 5, 0, 0, 0)
