"""Truncated SimRank vs a dense numpy twin."""

import numpy as np

from adopt_spark.algos.simrank import SIMRANK_C, SIMRANK_ITERS, simrank
from tests.conftest import edge_df


def numpy_simrank(pairs, iters=SIMRANK_ITERS, c=SIMRANK_C):
    vs = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    inn = [[] for _ in range(n)]
    for a, b in set(pairs):
        if a != b:
            inn[idx[b]].append(idx[a])
    s = np.eye(n)
    for _ in range(iters):
        nxt = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b or not inn[a] or not inn[b]:
                    continue
                tot = sum(s[i, j] for i in inn[a] for j in inn[b])
                nxt[a, b] = c * tot / (len(inn[a]) * len(inn[b]))
        s = nxt
    return {(vs[a], vs[b]): s[a, b] for a in range(n) for b in range(n)
            if a != b and s[a, b] > 0}


def test_simrank_matches_numpy(spark):
    pairs = [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (3, 4), (4, 0),
             (5, 0), (5, 1)]
    got = {(r.a, r.b): r.s for r in
           simrank(spark, edge_df(spark, pairs)).collect()}
    exp = numpy_simrank(pairs)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-9
    # symmetry + range
    for (a, b), v in got.items():
        assert abs(got[(b, a)] - v) < 1e-12
        assert 0.0 < v <= 1.0
