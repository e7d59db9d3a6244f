"""Katz centrality vs a numpy reference + resume equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.algos.katz import katz_centrality


def _numpy_katz(pairs, n_iter=8, alpha=0.01, beta=1.0):
    nodes = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(nodes)}
    x = {v: beta for v in nodes}
    in_nbrs = {v: [] for v in nodes}
    for s, t in set(pairs):
        if s != t:
            in_nbrs[t].append(s)
    for _ in range(n_iter):
        x = {v: beta + alpha * sum(x[u] for u in in_nbrs[v])
             for v in nodes}
    return {v: round(x[v], 6) for v in nodes}


def test_katz_vs_numpy_random(spark):
    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 60, (400, 2))
             if a != b}
    df = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    out, metrics = katz_centrality(spark, df, alpha=0.05, max_iter=6)
    got = {r.v: r.katz for r in out.collect()}
    exp = _numpy_katz(pairs, n_iter=6, alpha=0.05)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=2e-6), v
    assert len(metrics) == 6


def test_katz_star_shape(spark):
    # star into 0: after 1 iter x(0) = 1 + 4*alpha; spokes stay 1
    pairs = [(1, 0), (2, 0), (3, 0), (4, 0)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    out, _ = katz_centrality(spark, df, alpha=0.1, max_iter=1)
    got = {r.v: r.katz for r in out.collect()}
    assert got[0] == pytest.approx(1.4)
    assert all(got[v] == 1.0 for v in (1, 2, 3, 4))


def test_katz_resume_equivalence(spark, tmp_path):
    rng = np.random.default_rng(11)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 40, (200, 2))
             if a != b}
    df = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    full, _ = katz_centrality(spark, df, max_iter=6)
    ck = str(tmp_path / "katz")
    katz_centrality(spark, df, max_iter=3, checkpoint_dir=ck)
    resumed, _ = katz_centrality(spark, df, max_iter=6,
                                 checkpoint_dir=ck, resume=True)
    a = {r.v: r.katz for r in full.collect()}
    b = {r.v: r.katz for r in resumed.collect()}
    assert a == b


def test_katz_empty(spark):
    df = spark.createDataFrame([], "sid long, tid long")
    out, metrics = katz_centrality(spark, df)
    assert out.count() == 0 and metrics == []
