"""HITS and weighted PageRank vs dense numpy references."""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.algos.hits import hits
from adopt_spark.algos.pagerank import pagerank


def py_hits(pairs, iters):
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in set(pairs):
        if a != b:
            A[idx[a], idx[b]] = 1.0
    auth = np.full(n, 1.0 / n)
    hub = np.full(n, 1.0 / n)
    for _ in range(iters):
        auth = A.T @ hub
        s = auth.sum()
        auth = auth / (s if s else 1.0)
        hub = A @ auth
        s = hub.sum()
        hub = hub / (s if s else 1.0)
    return {v: (auth[idx[v]], hub[idx[v]]) for v in verts}


def py_weighted_pr(pairs, weight, damping=0.85, iters=60):
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for a, b in set(pairs):
        if a != b:
            W[idx[a], idx[b]] = weight(a, b)
    outw = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1 - damping) / n)
        dangling = r[outw == 0].sum()
        new += damping * dangling / n
        for i in range(n):
            if outw[i]:
                new += damping * r[i] * W[i] / outw[i]
        r = new
    return {v: r[idx[v]] for v in verts}


def contract_w(u, v):
    return 1 + (u * 7 + v * 13) % 10


def test_hits_star(spark):
    # star: hub 0 points at 1..4 — 0 is the pure hub, 1..4 pure auths
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    state, metrics = hits(spark, edges, max_iter=5)
    got = {int(r["v"]): (float(r["auth"]), float(r["hub"]))
           for r in state.collect()}
    assert got[0][0] == 0.0 and got[0][1] == pytest.approx(1.0)
    for v in range(1, 5):
        assert got[v][0] == pytest.approx(0.25)
        assert got[v][1] == 0.0
    assert len(metrics) == 5


def test_hits_powerlaw_matches_numpy(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    state, _ = hits(spark, edges, max_iter=12)
    expect = py_hits(pairs, 12)
    got = {int(r["v"]): (float(r["auth"]), float(r["hub"]))
           for r in state.collect()}
    assert set(got) == set(expect)
    for v, (a, h) in expect.items():
        assert got[v][0] == pytest.approx(a, abs=1e-9)
        assert got[v][1] == pytest.approx(h, abs=1e-9)


def test_hits_resume(spark, powerlaw_small, tmp_path):
    edges, _ = powerlaw_small
    ck = str(tmp_path / "ck")
    full, _ = hits(spark, edges, max_iter=6, checkpoint_dir=ck)
    resumed, m = hits(spark, edges, max_iter=6, checkpoint_dir=ck,
                      resume=True)
    a = sorted((r.v, round(r.auth, 12), round(r.hub, 12))
               for r in full.collect())
    b = sorted((r.v, round(r.auth, 12), round(r.hub, 12))
               for r in resumed.collect())
    assert a == b and m == []


def test_weighted_pagerank_matches_numpy(spark, powerlaw_small):
    from pyspark.sql import functions as F

    from adopt_spark.algos.paths import contract_weight

    edges, pairs = powerlaw_small
    ew = edges.withColumn(
        "w", contract_weight(F.col("sid"), F.col("tid")).cast("double"))
    ranks, _ = pagerank(spark, ew, tol=0.0, max_iter=60, weight_col="w")
    expect = py_weighted_pr(pairs, contract_w)
    got = {int(r["v"]): float(r["rank"]) for r in ranks.collect()}
    for v, x in expect.items():
        assert got[v] == pytest.approx(x, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_equals_unweighted_on_constant_weights(spark, powerlaw_small):
    from pyspark.sql import functions as F

    edges, _ = powerlaw_small
    ew = edges.withColumn("w", F.lit(3.0))
    a, _ = pagerank(spark, ew, tol=0.0, max_iter=8, weight_col="w")
    b, _ = pagerank(spark, edges, tol=0.0, max_iter=8)
    ga = {r.v: r.rank for r in a.collect()}
    gb = {r.v: r.rank for r in b.collect()}
    for v in ga:
        assert ga[v] == pytest.approx(gb[v], abs=1e-12)
