"""Louvain local-move vs a pure-python twin of the synchronous rule."""

import numpy as np
import pytest

from adopt_spark.algos.louvain import louvain_move, louvain_sizes
from tests.conftest import edge_df


def py_louvain(pairs, sweeps=6):
    """Reference implementation of the exact parity-scheduled
    strict-improvement move rule (see algos/louvain.py docstring)."""
    sym = {}
    for a, b in pairs:
        if a == b:
            continue
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    if not sym:
        return {}
    k = {v: len(ns) for v, ns in sym.items()}
    two_m = sum(k.values())
    label = {v: v for v in sym}
    for _ in range(sweeps):
        prev = dict(label)
        for parity in (1, 0):
            tot = {}
            for v, l in label.items():
                tot[l] = tot.get(l, 0) + k[v]
            new = dict(label)
            for v, ns in sym.items():
                if v % 2 != parity:
                    continue
                w = {}
                for u in ns:
                    w[label[u]] = w.get(label[u], 0) + 1
                w.setdefault(label[v], 0)
                own = label[v]
                best = own
                best_score = two_m * w[own] - k[v] * (tot[own] - k[v])
                for c, wv in sorted(w.items()):
                    if c == own:
                        continue
                    score = two_m * wv - k[v] * tot[c]
                    if score > best_score:
                        best, best_score = c, score
                new[v] = best
            label = new
        if label == prev:
            break
    return label


GRAPHS = ["tri6", "two_components", "star_hub", "powerlaw_small"]


@pytest.mark.parametrize("gname", GRAPHS)
def test_louvain_matches_python_twin(spark, gname, request):
    df, pairs = request.getfixturevalue(gname)
    labels, metrics = louvain_move(spark, df)
    got = {r["v"]: r["label"] for r in labels.collect()}
    assert got == py_louvain(pairs)
    assert len(metrics) >= 1


def test_louvain_two_cliques_bridge(spark):
    """Two K5s joined by one edge must resolve to exactly two
    communities, split at the bridge."""
    k5a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    k5b = [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    pairs = k5a + k5b + [(4, 10)]
    df = edge_df(spark, pairs)
    labels, _ = louvain_move(spark, df)
    got = {r["v"]: r["label"] for r in labels.collect()}
    assert got == py_louvain(pairs)
    a = {got[v] for v in range(5)}
    b = {got[v] for v in range(10, 15)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_louvain_partition_invariance(spark, powerlaw_small):
    df, pairs = powerlaw_small
    l1, _ = louvain_move(spark, df.repartition(1))
    l8, _ = louvain_move(spark, df.repartition(8))
    assert (sorted(map(tuple, l1.collect()))
            == sorted(map(tuple, l8.collect())))


def test_louvain_fixpoint_stability(spark, tri6):
    """Extra sweeps past the fixpoint are no-ops (the oracle-unroll
    contract: fixed unrolling and early stop agree)."""
    df, pairs = tri6
    a, _ = louvain_move(spark, df, sweeps=4)
    b, _ = louvain_move(spark, df, sweeps=9)
    assert (sorted(map(tuple, a.collect()))
            == sorted(map(tuple, b.collect())))


def test_louvain_degenerate(spark):
    empty = spark.createDataFrame([], "sid long, tid long")
    labels, metrics = louvain_move(spark, empty)
    assert labels.count() == 0
    loops = edge_df(spark, [(1, 1), (2, 2)])
    labels, _ = louvain_move(spark, loops)
    assert labels.count() == 0
    sizes = louvain_sizes(spark, edge_df(spark, [(0, 1)]))
    rows = {(r["label"], r["size"]) for r in sizes.collect()}
    # a single edge: both endpoints end in one community of size 2
    assert sum(s for _, s in rows) == 2 and len(rows) == 1
