"""Shared fixtures: one SparkSession per test run + tiny graph fixtures.

Oracle strategy (SURVEY.md §5): differential testing. SQL-expressible
ops compare against DuckDB on identical data; graph algorithms compare
against small pure-python/numpy references implemented here (the image
has no networkx).
"""

from __future__ import annotations

import numpy as np
import pytest

from adopt_spark.session import get_spark

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adopt_spark_tests", cpus=4, shuffle_partitions=8)
    yield s


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "sid long, tid long"
    )


@pytest.fixture(scope="session")
def tri6(spark):
    """6 vertices: two triangles sharing edge handling + a square.

    Edges (undirected intent, stored once as (lo,hi)):
    triangle A: 0-1, 1-2, 0-2 ; triangle B: 2-3, 3-4, 2-4 ;
    square: 1-5, 4-5 (+ existing 1-2, 2-4 edges make no extra triangle)
    """
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (1, 5), (4, 5)]
    return edge_df(spark, pairs), pairs


@pytest.fixture(scope="session")
def two_components(spark):
    rng = np.random.default_rng(42)
    pairs = set()
    for base in (0, 100):
        n = 50
        # random connected-ish blob: a ring + random chords
        for i in range(n):
            pairs.add((base + i, base + (i + 1) % n))
        for _ in range(60):
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.add((base + int(min(a, b)), base + int(max(a, b))))
    return edge_df(spark, sorted(pairs)), sorted(pairs)


@pytest.fixture(scope="session")
def star_hub(spark):
    """Hub of degree 500 + a 20-chain: the skew fixture. 0 triangles."""
    pairs = [(0, i) for i in range(1, 501)]
    pairs += [(1000 + i, 1001 + i) for i in range(20)]
    pairs += [(0, 1000)]
    return edge_df(spark, pairs), pairs


@pytest.fixture(scope="session")
def powerlaw_small(spark):
    """Barabási–Albert-style preferential attachment, n=300, m=3, seed=42."""
    pairs = ba_graph(300, 3, 42)
    return edge_df(spark, pairs), pairs


def ba_graph(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = []
    pairs = []
    for v in range(m, n):
        for t in set(targets):
            pairs.append((min(v, t), max(v, t)))
            repeated.extend([v, t])
        targets = [int(repeated[rng.integers(0, len(repeated))]) for _ in range(m)]
    return sorted(set(pairs))


# ---------- pure-python oracles ----------

def py_triangles(pairs) -> int:
    """Id-ordered triangle count over the lt-filtered pair set."""
    es = {(a, b) for a, b in pairs if a < b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    count = 0
    for a, nbrs in adj.items():
        for b in nbrs:
            count += len(nbrs & adj.get(b, set()))
    return count


def py_components(pairs) -> dict[int, int]:
    """Union-find; label = min vertex id of the component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


def py_pagerank(pairs, damping=0.85, tol=1e-12, max_iter=500) -> dict[int, float]:
    """Dense power iteration on the DIRECTED graph (sid→tid as given)."""
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out: dict[int, list[int]] = {i: [] for i in range(n)}
    seen = set()
    for a, b in pairs:
        k = (idx[a], idx[b])
        if k not in seen:
            seen.add(k)
            out[idx[a]].append(idx[b])
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new = np.full(n, (1 - damping) / n)
        dangling = 0.0
        for i, dsts in out.items():
            if dsts:
                share = damping * r[i] / len(dsts)
                for j in dsts:
                    new[j] += share
            else:
                dangling += r[i]
        new += damping * dangling / n
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in verts}
