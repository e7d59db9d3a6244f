"""Densest subgraph (BKV eps=1/2 peel) vs a pure-python peel twin."""

import collections

import numpy as np

from adopt_spark.algos.densest import densest_subgraph


def python_peel(edge_list):
    """Exact python twin of the eps=1/2 peel: returns (vertex set,
    round, nv, ne) of the densest intermediate subgraph."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    best = (0, 1, -1, frozenset())  # ne, nv, round, verts
    rnd = 0
    while edges:
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        nv, ne = len(deg), len(edges)
        if ne * best[1] > best[0] * nv:
            best = (ne, nv, rnd, frozenset(deg))
        keep = {v for v, d in deg.items() if d * nv > 3 * ne}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        rnd += 1
    return best


def run_case(spark, edge_list, n_parts):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], "sid long, tid long"
    ).repartition(n_parts)
    out = densest_subgraph(spark, df).collect()
    ne, nv, rnd, verts = python_peel(edge_list)
    assert {r["v"] for r in out} == set(verts)
    if out:
        assert out[0]["round"] == rnd
        assert out[0]["nv"] == nv == len(out)
        assert out[0]["ne"] == ne


def test_densest_planted_clique(spark):
    # sparse random background + planted K12: the peel must recover
    # exactly the clique, at any partitioning
    rng = np.random.default_rng(3)
    bg = [(int(a) + 100, int(b) + 100)
          for a, b in rng.integers(0, 500, (400, 2)) if a != b]
    plant = [(a, b) for a in range(12) for b in range(a + 1, 12)]
    edges = bg + plant
    run_case(spark, edges, n_parts=1)
    run_case(spark, edges, n_parts=9)


def test_densest_whole_graph_optimum(spark):
    # a clique alone: round 0 (the full graph) is already optimal
    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    run_case(spark, edges, n_parts=3)


def test_densest_path_graph(spark):
    # path graph: density 1 - 1/n; peel collapses fast, best = round 0
    edges = [(i, i + 1) for i in range(30)]
    run_case(spark, edges, n_parts=4)


def test_densest_empty_and_loops(spark):
    empty = spark.createDataFrame([], "sid long, tid long")
    assert densest_subgraph(spark, empty).count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "sid long, tid long")
    assert densest_subgraph(spark, loops).count() == 0
