"""ANF sketches vs an exact numpy replay + semantic invariants.

The engine's sketches are deterministic, so a python replay of the
same hash/propagation must match the estimates to float tolerance;
separately, the ESTIMATE is sanity-checked against exact BFS
neighborhood counts (FM error bounds are loose, so only ballpark).
"""

import math

import numpy as np

from adopt_spark.algos.anf import (
    ANF_BITS, ANF_K, ANF_PHI, anf_neighborhood)
from adopt_spark.algos.matching import MATCH_EDGE_MIX
from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME
from tests.conftest import edge_df


def python_anf(pairs, rounds, k=ANF_K):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, {a}).add(b)
        adj.setdefault(b, {b}).add(a)
    verts = sorted(adj)

    def init_mask(v, j):
        h = ((v % MIS_PRIME) * MIS_MULT + (j + 1) * MATCH_EDGE_MIX) % MIS_PRIME
        tz = 63 if h == 0 else (h & -h).bit_length() - 1
        return 1 << min(tz, ANF_BITS - 1)

    mask = {v: [init_mask(v, j) for j in range(k)] for v in verts}
    curve = []
    for _ in range(rounds):
        nxt = {}
        for v in verts:
            ms = [0] * k
            for u in adj[v]:
                for j in range(k):
                    ms[j] |= mask[u][j]
            nxt[v] = ms
        mask = nxt
        est = 0.0
        for v in verts:
            r = sum(((~m) & (m + 1)).bit_length() - 1
                    for m in mask[v]) / k
            est += 2.0 ** r
        curve.append(est / ANF_PHI)
    return curve


def exact_anf(pairs, rounds):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, {a}).add(b)
        adj.setdefault(b, {b}).add(a)
    reach = {v: set(ns) for v, ns in adj.items()}
    out = []
    for _ in range(rounds):
        reach = {v: set.union(*(adj[u] for u in rs)) | rs
                 for v, rs in reach.items()} if out else reach
        out.append(sum(len(rs) for rs in reach.values()))
    return out


def test_anf_matches_python_replay(spark):
    rng = np.random.default_rng(11)
    pairs = sorted({(int(min(p)), int(max(p)))
                    for p in rng.integers(0, 60, (150, 2)) if p[0] != p[1]})
    got = {r["h"]: (r["anf"], r["pct"])
           for r in anf_neighborhood(edge_df(spark, pairs), rounds=3).collect()}
    exp = python_anf(pairs, 3)
    assert set(got) == {1, 2, 3}
    for h in (1, 2, 3):
        assert math.isclose(got[h][0], exp[h - 1], rel_tol=1e-9)
        assert math.isclose(got[h][1], exp[h - 1] / exp[2], rel_tol=1e-9)
    # monotone: reachability only grows
    assert exp[0] <= exp[1] <= exp[2]
    # FM ballpark vs exact BFS (k=8 sketches: generous factor-2 band)
    ex = exact_anf(pairs, 3)
    for h in (1, 2, 3):
        assert ex[h - 1] / 2.5 <= exp[h - 1] <= ex[h - 1] * 2.5


def test_anf_path_graph_saturates(spark):
    # path 0-1-2-3: diameter 3 -> curve strictly grows then pct hits 1
    rows = anf_neighborhood(edge_df(spark, [(0, 1), (1, 2), (2, 3)]),
                            rounds=4).collect()
    by_h = {r["h"]: r for r in rows}
    assert len(rows) == 4
    assert by_h[4]["pct"] == 1.0
    assert by_h[1]["anf"] <= by_h[2]["anf"] <= by_h[3]["anf"]
    # replay agrees on the tiny fixture too
    exp = python_anf([(0, 1), (1, 2), (2, 3)], 4)
    for h in range(1, 5):
        assert math.isclose(by_h[h]["anf"], exp[h - 1], rel_tol=1e-9)


def test_anf_empty(spark):
    out = anf_neighborhood(edge_df(spark, []))
    assert out.count() == 0 and out.columns == ["h", "anf", "pct"]
