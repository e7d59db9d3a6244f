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
