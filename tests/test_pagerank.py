"""PageRank vs dense numpy power iteration; allclose 1e-6 (north rule)."""

import numpy as np
import pytest

from adopt_spark.algos.pagerank import pagerank
from tests.conftest import py_pagerank


@pytest.mark.parametrize("fixture", ["tri6", "star_hub", "powerlaw_small"])
def test_pagerank_allclose(spark, fixture, request):
    df, pairs = request.getfixturevalue(fixture)
    expected = py_pagerank(pairs)
    ranks, metrics = pagerank(spark, df, tol=1e-9, max_iter=200)
    got = {r["v"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=1e-6)
    # mass conservation
    assert np.isclose(sum(got.values()), 1.0, atol=1e-9)
    # convergence metric recorded every superstep
    assert metrics[-1]["l1_delta"] <= 1e-9
    assert all("edges_per_sec" in m for m in metrics)


def test_pagerank_hub_salting_equivalent(spark, star_hub):
    df, pairs = star_hub
    base, _ = pagerank(spark, df, tol=1e-10, max_iter=200)
    salted, _ = pagerank(spark, df, tol=1e-10, max_iter=200, hub_threshold=50)
    b = {r["v"]: r["rank"] for r in base.collect()}
    s = {r["v"]: r["rank"] for r in salted.collect()}
    assert set(b) == set(s)
    for v in b:
        assert s[v] == pytest.approx(b[v], abs=1e-9)


def test_spam_mass_separates_farm_from_trusted(spark):
    """TrustRank spam-mass law: a spam farm reachable only from
    itself gets spam_mass ~ 1; the trusted core and what it links to
    get low spam mass (the q_spam_mass composition, on a fixture)."""
    # trusted clique 0-1-2 linking to honest page 3; disjoint spam
    # farm 10..13 densely self-linked
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3),
             (10, 11), (11, 12), (12, 13), (13, 10), (10, 12), (11, 13)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    pr, _ = pagerank(spark, df, tol=0.0, max_iter=30)
    tr, _ = pagerank(spark, df, tol=0.0, max_iter=30,
                     reset_vertices=[0, 1, 2])
    p = {r.v: r.rank for r in pr.collect()}
    t = {r.v: r.rank for r in tr.collect()}
    mass = {v: (p[v] - t[v]) / p[v] for v in p}
    for spam in (10, 11, 12, 13):
        assert mass[spam] > 0.99
    for good in (0, 1, 2, 3):
        assert mass[good] < 0.5
        for spam in (10, 11, 12, 13):
            assert mass[good] < mass[spam]


def test_convergence_telemetry_contracts(spark, powerlaw_small):
    """The recorded L1 deltas are positive and contract overall (the
    value-level parity with the unrolled recurrence is the contract
    gate's job; this pins the telemetry's shape)."""
    df, _ = powerlaw_small
    _, metrics = pagerank(spark, df, tol=0.0, max_iter=8)
    deltas = [m["l1_delta"] for m in metrics]
    assert len(deltas) == 8
    assert all(d > 0 for d in deltas)
    assert deltas[-1] < deltas[0] / 3     # geometric-ish contraction
