"""Personalized PageRank vs a dense numpy oracle."""

import numpy as np
import pytest

from adopt_spark.algos.pagerank import pagerank


def py_ppr(pairs, sources, damping=0.85, max_iter=500, tol=1e-12):
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    p = np.zeros(n)
    for s in sources:
        p[idx[s]] = 1.0 / len(sources)
    out = {i: [] for i in range(n)}
    seen = set()
    for a, b in pairs:
        k = (idx[a], idx[b])
        if k not in seen:
            seen.add(k)
            out[idx[a]].append(idx[b])
    r = p.copy()
    for _ in range(max_iter):
        new = (1 - damping) * p
        dangling = 0.0
        for i, dsts in out.items():
            if dsts:
                share = damping * r[i] / len(dsts)
                for j in dsts:
                    new[j] += share
            else:
                dangling += r[i]
        new += damping * dangling * p
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in verts}


def test_ppr_allclose(spark, powerlaw_small):
    df, pairs = powerlaw_small
    sources = [0, 1, 2]
    expected = py_ppr(pairs, sources)
    ranks, metrics = pagerank(spark, df, tol=1e-9, max_iter=200,
                              reset_vertices=sources)
    got = {r["v"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_mass_concentrates_near_sources(spark, star_hub):
    df, pairs = star_hub
    ranks, _ = pagerank(spark, df, tol=1e-9, max_iter=100, reset_vertices=[0])
    got = {r["v"]: r["rank"] for r in ranks.collect()}
    # teleport source 0 holds the most mass; far chain vertices near zero
    assert got[0] == max(got.values())
    assert got[1020] < got[0] * 0.01
