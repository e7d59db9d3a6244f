"""SALSA vs a dense numpy reference (degree-normalized HITS)."""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.algos.salsa import salsa


def py_salsa(pairs, iters):
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in set(pairs):
        if a != b:
            A[idx[a], idx[b]] = 1.0
    outdeg = A.sum(axis=1)
    indeg = A.sum(axis=0)
    Wh = np.divide(A, outdeg[:, None], out=np.zeros_like(A),
                   where=outdeg[:, None] > 0)   # hub -> auth transition
    Wa = np.divide(A, indeg[None, :], out=np.zeros_like(A),
                   where=indeg[None, :] > 0)    # auth -> hub transition
    auth = np.full(n, 1.0 / n)
    hub = np.full(n, 1.0 / n)
    for _ in range(iters):
        auth = Wh.T @ hub
        s = auth.sum()
        auth = auth / (s if s else 1.0)
        hub = Wa @ auth
        s = hub.sum()
        hub = hub / (s if s else 1.0)
    return {v: (auth[idx[v]], hub[idx[v]]) for v in verts}


def test_salsa_star(spark):
    # star 0 -> 1..4: SALSA authorities split the mass evenly (each
    # in-edge carries hub(0)/outdeg(0) = 1/4), hub 0 takes it all back
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    state, metrics = salsa(spark, edges, max_iter=5)
    got = {int(r["v"]): (float(r["auth"]), float(r["hub"]))
           for r in state.collect()}
    assert got[0][0] == 0.0 and got[0][1] == pytest.approx(1.0)
    for v in range(1, 5):
        assert got[v][0] == pytest.approx(0.25)
        assert got[v][1] == 0.0
    assert len(metrics) == 5


def test_salsa_powerlaw_matches_numpy(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    state, _ = salsa(spark, edges, max_iter=12)
    expect = py_salsa(pairs, 12)
    got = {int(r["v"]): (float(r["auth"]), float(r["hub"]))
           for r in state.collect()}
    assert set(got) == set(expect)
    for v, (a, h) in expect.items():
        assert got[v][0] == pytest.approx(a, abs=1e-9)
        assert got[v][1] == pytest.approx(h, abs=1e-9)


def test_salsa_differs_from_hits_on_skew(spark, powerlaw_small):
    """Degree normalization is the point of SALSA: on a hub-skewed
    graph the two rankings must NOT coincide (else the operator is a
    re-export of HITS)."""
    from adopt_spark.algos.hits import hits

    edges, _ = powerlaw_small
    s, _ = salsa(spark, edges, max_iter=8)
    h, _ = hits(spark, edges, max_iter=8)
    sa = {r.v: round(r.auth, 9) for r in s.collect()}
    ha = {r.v: round(r.auth, 9) for r in h.collect()}
    assert sa != ha


def test_salsa_resume(spark, powerlaw_small, tmp_path):
    edges, _ = powerlaw_small
    ck = str(tmp_path / "ck")
    full, _ = salsa(spark, edges, max_iter=6, checkpoint_dir=ck)
    resumed, m = salsa(spark, edges, max_iter=6, checkpoint_dir=ck,
                       resume=True)
    a = sorted((r.v, round(r.auth, 12), round(r.hub, 12))
               for r in full.collect())
    b = sorted((r.v, round(r.auth, 12), round(r.hub, 12))
               for r in resumed.collect())
    assert a == b and m == []


def test_salsa_empty(spark):
    edges = spark.createDataFrame([], "sid long, tid long")
    state, metrics = salsa(spark, edges, max_iter=3)
    assert state.count() == 0 and metrics == []
