"""Differential tests for eigenvector centrality + Markov stationary."""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.algos.eigen import eigenvector_centrality


def _numpy_eigen(pairs, iters=10):
    vs = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    a = np.zeros((n, n))
    for u, w in pairs:
        if u != w:
            a[idx[u], idx[w]] = a[idx[w], idx[u]] = 1.0
    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        x = a @ x
        x = x / np.linalg.norm(x)
    return {v: x[idx[v]] for v in vs}


@pytest.mark.parametrize("parts", [1, 5])
def test_eigen_matches_numpy(spark, powerlaw_small, parts):
    edges, pairs = powerlaw_small
    scores, metrics = eigenvector_centrality(
        spark, edges.repartition(parts), max_iter=10)
    got = {r.v: r.eigen for r in scores.collect()}
    ref = _numpy_eigen(pairs)
    assert set(got) == set(ref)
    for v, x in ref.items():
        assert got[v] == pytest.approx(x, abs=2e-6)
    assert len(metrics) == 10


def test_eigen_star_center_dominates(spark):
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "sid long, tid long")
    scores, _ = eigenvector_centrality(spark, edges, max_iter=10)
    got = {r.v: r.eigen for r in scores.collect()}
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 6)]
    assert max(leaves) - min(leaves) < 1e-9


def test_eigen_empty(spark):
    empty = spark.createDataFrame([], "sid long, tid long")
    scores, metrics = eigenvector_centrality(spark, empty)
    assert scores.count() == 0 and metrics == []


def test_markov_stationary_fixed_point(spark):
    """The engine's 20-step iterate must satisfy pi P ~ pi on the
    restricted chain (power iteration of an ergodic chain converges
    well before 20 steps at 5 states)."""
    from adopt_spark.queries.registry import q_markov_stationary
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = {r.state: r.pi for r in q_markov_stationary(spark, sf).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-4
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf}/events.parquet'")
    rows = con.sql("""
        WITH pairs AS (
            SELECT src, dst, count(*) AS n FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS dst
                FROM events) WHERE dst IS NOT NULL GROUP BY src, dst)
        SELECT src, dst, n FROM pairs
        WHERE dst IN (SELECT DISTINCT src FROM pairs)
    """).fetchall()
    tot: dict = {}
    for s, d, n in rows:
        tot[s] = tot.get(s, 0) + n
    nxt: dict = {}
    for s, d, n in rows:
        nxt[d] = nxt.get(d, 0.0) + out[s] * n / tot[s]
    for s, p in out.items():
        assert nxt[s] == pytest.approx(p, abs=1e-5)
