"""motif_census_4 vs brute-force 4-subset enumeration.

The Spark side counts via ESCAPE-style identities; the test oracle
enumerates every C(n,4) vertex subset, classifies its induced
subgraph by degree sequence, and derives non-induced counts by the
forward copies matrix — three independent formulations triangulating
the same six numbers.
"""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from adopt_spark.algos.census import motif_census_4

# non-induced copies of each motif inside each induced supergraph:
# rows = motif, cols = (p4, claw, paw, c4, diamond, k4)
_COPIES = {
    "p4_path": {"p4_path": 1, "paw_tailed_tri": 2, "c4_cycle": 4,
                "diamond": 6, "k4_clique": 12},
    "claw_star": {"claw_star": 1, "paw_tailed_tri": 1, "diamond": 2,
                  "k4_clique": 4},
    "paw_tailed_tri": {"paw_tailed_tri": 1, "diamond": 4, "k4_clique": 12},
    "c4_cycle": {"c4_cycle": 1, "diamond": 1, "k4_clique": 3},
    "diamond": {"diamond": 1, "k4_clique": 6},
    "k4_clique": {"k4_clique": 1},
}


def _classify(sub_edges: int, degs: tuple) -> str | None:
    """Induced 4-vertex subgraph -> motif name (None if disconnected)."""
    if sub_edges == 3:
        if degs == (1, 1, 1, 3):
            return "claw_star"
        if degs == (1, 1, 2, 2):
            return "p4_path"
        return None  # triangle + isolate, or star-ish disconnected
    if sub_edges == 4:
        if degs == (2, 2, 2, 2):
            return "c4_cycle"
        if degs == (1, 2, 2, 3):
            return "paw_tailed_tri"
        return None
    if sub_edges == 5:
        return "diamond"
    if sub_edges == 6:
        return "k4_clique"
    return None


def _brute(edge_set: set) -> tuple[dict, dict]:
    verts = sorted({v for e in edge_set for v in e})
    induced = {m: 0 for m in _COPIES}
    for quad in combinations(verts, 4):
        es = [(a, b) for a, b in combinations(quad, 2)
              if (a, b) in edge_set or (b, a) in edge_set]
        d = {v: 0 for v in quad}
        for a, b in es:
            d[a] += 1
            d[b] += 1
        if min(d.values()) == 0:
            continue
        m = _classify(len(es), tuple(sorted(d.values())))
        if m:
            induced[m] += 1
    non_ind = {
        m: sum(cnt * induced[g] for g, cnt in _COPIES[m].items())
        for m in _COPIES
    }
    return non_ind, induced


@pytest.mark.parametrize("seed,n,p", [(1, 14, 0.35), (2, 20, 0.2),
                                      (3, 12, 0.6)])
def test_census_matches_bruteforce(spark, seed, n, p):
    rng = random.Random(seed)
    edge_set = {(a, b) for a, b in combinations(range(n), 2)
                if rng.random() < p}
    # feed a messy directed/multi view: reversed + duplicate rows
    rows = [(a, b) for a, b in edge_set] + \
           [(b, a) for a, b in edge_set if rng.random() < 0.5]
    df = spark.createDataFrame(rows, "sid long, tid long")
    got = {r.motif: (r.n, r.n_induced)
           for r in motif_census_4(df).collect()}
    non_ind, induced = _brute(edge_set)
    for m in _COPIES:
        assert got[m] == (non_ind[m], induced[m]), (m, got[m],
                                                    non_ind[m], induced[m])


def test_census_k5_exact(spark):
    # K5: closed forms — C(5,4) quads, each a K4
    edges = [(a, b) for a, b in combinations(range(5), 2)]
    df = spark.createDataFrame(edges, "sid long, tid long")
    got = {r.motif: (r.n, r.n_induced)
           for r in motif_census_4(df).collect()}
    assert got["k4_clique"] == (5, 5)
    assert got["diamond"] == (30, 0)       # 6 per K4, none induced
    assert got["c4_cycle"] == (15, 0)      # 3 per K4
    assert got["p4_path"] == (60, 0)       # 12 per K4
    assert got["claw_star"] == (20, 0)     # 4 per K4
    assert got["paw_tailed_tri"] == (60, 0)


def test_census_empty(spark):
    df = spark.createDataFrame([], "sid long, tid long")
    assert motif_census_4(df).count() == 0
