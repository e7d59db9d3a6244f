"""PPR sweep cut (algos/localcom.py) and ReFeX roles (algos/roles.py)
vs pure-python twins."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest


def _py_ppr(pairs_sym, seed, iters, damping=0.85):
    """Personalized power iteration, teleport+dangling to the seed,
    r0 = seed distribution — the algos/pagerank.py law."""
    verts = sorted({v for e in pairs_sym for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = defaultdict(list)
    for a, b in pairs_sym:
        out[idx[a]].append(idx[b])
    p = np.zeros(n)
    p[idx[seed]] = 1.0
    r = p.copy()
    for _ in range(iters):
        new = (1 - damping) * p
        dangling = 0.0
        for i in range(n):
            if out[i]:
                share = damping * r[i] / len(out[i])
                for j in out[i]:
                    new[j] += share
            else:
                dangling += r[i]
        new += damping * dangling * p
        r = new
    return {v: float(r[idx[v]]) for v in verts}


def _r6(x):
    """HALF_UP 6 dp rounding (Spark/DuckDB round()); python's builtin
    round() is half-even and disagrees on exact ties like 244/512."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_sweep(pairs, iters=12):
    lt = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    sym = [(a, b) for a, b in lt] + [(b, a) for a, b in lt]
    seed = min(v for e in lt for v in e)
    ppr = {v: _r6(x) for v, x in _py_ppr(sym, seed, iters).items()}
    deg = defaultdict(int)
    for a, b in lt:
        deg[a] += 1
        deg[b] += 1
    order = sorted(deg, key=lambda v: (-(ppr[v] / deg[v]), v))
    rank = {v: i + 1 for i, v in enumerate(order)}
    vol_all = sum(deg.values())
    n = len(order)
    rows = {}
    vol = cut = 0
    inside = set()
    for k, v in enumerate(order, 1):
        vol += deg[v]
        for nbr in (b for a, b in lt if a == v) :
            cut += -1 if nbr in inside else 1
        for nbr in (a for a, b in lt if b == v):
            cut += -1 if nbr in inside else 1
        inside.add(v)
        if k < n:
            phi = _r6(cut / min(vol, vol_all - vol))
            rows[k] = (v, ppr[v], cut, vol, phi)
    return rows


def test_ppr_sweep_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.localcom import ppr_sweep

    df, pairs = powerlaw_small
    want = _py_sweep(pairs)
    got = {r.k: (r.v, r.ppr, r.cut, r.vol, r.phi)
           for r in ppr_sweep(spark, df).collect()}
    assert got == want


def test_ppr_sweep_two_cliques_finds_the_cut(spark):
    from adopt_spark.algos.localcom import best_community, ppr_sweep

    # two K5s joined by one bridge edge: the min-conductance prefix is
    # exactly the seed's clique
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 10, b + 10) for a in range(5) for b in range(a + 1, 5)]
    pairs = k5a + k5b + [(0, 10)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    best = best_community(spark, df).collect()[0]
    assert best.k == 5
    assert best.cut == 1
    curve = {r.k: r.v for r in ppr_sweep(spark, df).collect()}
    assert set(curve[k] for k in range(1, 6)) == set(range(5))


def _py_bin(x):
    return sum(1 for j in range(20) if x >= (1 << j))


def _py_refex(pairs):
    lt = {(a, b) for a, b in pairs if a < b}
    adj = defaultdict(set)
    for a, b in lt:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in lt:
        for c in adj[a] & adj[b]:
            if c > b:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    f = {v: [float(len(adj[v])), float(tri[v])] for v in adj}
    for _ in range(2):
        nxt = {}
        for v in adj:
            vals = [f[n][-2] for n in adj[v]], [f[n][-1] for n in adj[v]]
            nxt[v] = [round(sum(vals[0]) / len(vals[0]), 6),
                      round(sum(vals[1]) / len(vals[1]), 6)]
        for v in adj:
            f[v] = f[v] + nxt[v]
    sig = {v: tuple(_py_bin(x) for x in f[v]) for v in adj}
    rep = {}
    for v, s in sig.items():
        rep[s] = min(rep.get(s, v), v)
    return {v: sig[v] + (rep[sig[v]],) for v in adj}


def test_refex_roles_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.roles import refex_roles

    df, pairs = powerlaw_small
    want = _py_refex(pairs)
    got = {r.v: (r.b_deg, r.b_tri, r.b_nd, r.b_nt, r.b_nd2, r.b_nt2, r.role)
           for r in refex_roles(df).collect()}
    assert got == want


def test_refex_mirrors_share_a_role(spark):
    from adopt_spark.algos.roles import refex_roles

    # spokes of a star are all structurally identical -> one role
    pairs = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    rows = refex_roles(df).collect()
    roles = {r.v: r.role for r in rows}
    assert len({roles[i] for i in range(1, 8)}) == 1
    assert roles[0] != roles[1]


def test_refex_validates_rounds(spark):
    from adopt_spark.algos.roles import refex_roles

    df = spark.createDataFrame([(0, 1)], "sid long, tid long")
    with pytest.raises(ValueError):
        refex_roles(df, rounds=0)
