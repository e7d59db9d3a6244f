"""Both triangle counters vs the pure-python oracle and each other."""

import pytest

from adopt_spark.algos.triangles import triangle_count
from tests.conftest import py_triangles


@pytest.mark.parametrize("fixture", ["tri6", "two_components", "star_hub", "powerlaw_small"])
@pytest.mark.parametrize("method", ["join", "csr", "cogroup", "auto"])
def test_triangle_count(spark, fixture, method, request):
    df, pairs = request.getfixturevalue(fixture)
    expected = py_triangles(pairs)
    got = triangle_count(df, method=method).collect()[0]["n_triangles"]
    assert got == expected


def test_tri6_exact(spark, tri6):
    df, pairs = tri6
    assert py_triangles(pairs) == 2
    assert triangle_count(df, "join").collect()[0][0] == 2
    assert triangle_count(df, "csr").collect()[0][0] == 2


def test_star_hub_zero(spark, star_hub):
    df, _ = star_hub
    assert triangle_count(df, "csr").collect()[0][0] == 0


def test_auto_overhead_bounded(spark):
    """Regression guard for the r03 driver-bench anomaly (auto 19.5s
    vs 3.8s for the plan it dispatched to): auto = one probe aggregate
    + the chosen plan reusing the probed orientation, so its wall time
    must stay within a small multiple of the standalone strategy.
    Bounds are generous (bursty-VM tolerance, min-of-2 reps) — this
    catches a structural 5x regression (orientation recompute, cache
    eviction), not scheduler jitter."""
    import time

    from adopt_spark.edges import derived_edges

    edges = derived_edges(spark, "/root/testdata/sf0.01").persist()
    edges.count()

    def wall(method):
        reps = []
        for _ in range(2):
            t0 = time.time()
            triangle_count(edges, method).collect()
            reps.append(time.time() - t0)
        return min(reps)

    csr = wall("csr")          # the plan auto picks on this dense graph
    auto = wall("auto")
    edges.unpersist()
    assert auto <= 2.5 * csr + 5.0, (auto, csr)


def test_triangle_sampled_matches_python(spark):
    from adopt_spark.algos.triangles import (
        DOULION_A, DOULION_B, DOULION_M, triangle_count_sampled,
    )

    x, pairs = 19, set()
    for _ in range(400):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = x % 60
        x = (x * 1103515245 + 12345) % (1 << 31)
        t = x % 60
        if s != t:
            pairs.add((min(s, t), max(s, t)))
    e = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    p = 30
    row = triangle_count_sampled(e, p).collect()[0]

    gate = lambda a, b: ((a * DOULION_A + b * DOULION_B)  # noqa: E731
                         % DOULION_M) % 100 < p
    samp = {e_ for e_ in pairs if gate(*e_)}

    def tri(es):
        s = set(es)
        vs = sorted({v for e_ in es for v in e_})
        return sum(1 for i, a in enumerate(vs)
                   for b in vs[i + 1:] if (a, b) in s
                   for c in vs if c > b and (a, c) in s and (b, c) in s)

    assert row.sampled_edges == len(samp)
    assert row.sampled_triangles == tri(samp)
    assert row.exact_triangles == tri(pairs)
    assert row.estimate == pytest.approx(
        round(tri(samp) * (100.0 / p) ** 3, 4))


def test_triangle_sampled_p100_is_exact(spark):
    from adopt_spark.algos.triangles import triangle_count_sampled

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "sid long, tid long")
    row = triangle_count_sampled(e, 100).collect()[0]
    assert row.sampled_edges == 4
    assert row.estimate == row.exact_triangles == 1

    import pytest as _pt
    with _pt.raises(ValueError):
        triangle_count_sampled(e, 0)


def test_triangle_incremental_vs_python(spark, powerlaw_small):
    """Delta accounting replayed in python: triangles with >= 1 new
    edge + base/total identities."""
    from pyspark.sql import functions as F

    from adopt_spark.algos.triangles import triangle_count_incremental

    df, pairs = powerlaw_small
    lt = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in lt:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = {tuple(sorted((a, b, c)))
            for a, b in lt for c in adj[a] & adj[b]}
    new = lambda e: (e[0] + e[1]) % 7 == 0
    n_new = sum(1 for (x, y, z) in tris
                if new((x, y)) or new((x, z)) or new((y, z)))
    row = triangle_count_incremental(
        df, (F.col("a") + F.col("b")) % 7 == 0).collect()[0]
    assert row.n_edges == len(lt)
    assert row.n_delta_edges == sum(1 for e in lt if new(e))
    assert row.n_new_triangles == n_new
    assert row.n_total_triangles == len(tris)
    assert row.n_base_triangles == len(tris) - n_new
