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
