"""DAG depth (oriented longest path) vs a python topological twin."""

import collections

import numpy as np

from adopt_spark.algos.dag import dag_depth


def py_depth(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj_in = collections.defaultdict(list)
    nodes = set()
    for a, b in und:
        adj_in[b].append(a)
        nodes.update((a, b))
    depth = {}
    for v in sorted(nodes):        # numeric order = topo order
        depth[v] = max((depth[u] + 1 for u in adj_in.get(v, [])), default=0)
    return depth


def run_case(spark, edges, n_parts):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "sid long, tid long"
    ).repartition(n_parts)
    got = {r["v"]: r["depth"] for r in dag_depth(spark, df).collect()}
    assert got == py_depth(edges)


def test_dag_depth_chain_and_star(spark):
    run_case(spark, [(i, i + 1) for i in range(12)], 3)   # chain: 0..12
    run_case(spark, [(0, i) for i in range(1, 9)], 2)     # star: all depth 1


def test_dag_depth_random(spark):
    rng = np.random.default_rng(17)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (200, 2))
             if a != b]
    run_case(spark, edges, 1)
    run_case(spark, edges, 7)


def test_dag_depth_empty(spark):
    df = spark.createDataFrame([], "sid long, tid long")
    assert dag_depth(spark, df).count() == 0
