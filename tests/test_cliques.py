"""Generalized k-clique leapfrog kernel vs the DuckDB-checked SQL plan."""

import duckdb
import pandas as pd
import pytest

from adopt_spark.algos.cliques import (
    clique_count, clique_count_cogroup, clique_count_csr,
)
from adopt_spark.algos.motifs import clique_sql
from adopt_spark.algos.triangles import triangle_count


def duck_count(pairs, sql):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs, columns=["sid", "tid"]))
    return con.execute(sql).fetchone()[0]


@pytest.mark.parametrize("fixture", ["tri6", "two_components", "powerlaw_small"])
@pytest.mark.parametrize("k", [3, 4, 5])
@pytest.mark.parametrize("counter", [clique_count_csr, clique_count_cogroup,
                                     clique_count])
def test_clique_kernels_vs_duckdb(spark, fixture, k, counter, request):
    df, pairs = request.getfixturevalue(fixture)
    expected = duck_count(pairs, clique_sql(k))
    got = counter(df, k).collect()[0]["n_cliques"]
    assert got == expected


def test_k3_equals_triangle_kernels(spark, powerlaw_small):
    df, _ = powerlaw_small
    k3 = clique_count_csr(df, 3).collect()[0][0]
    assert k3 == triangle_count(df, "csr").collect()[0][0]
    assert k3 == triangle_count(df, "join").collect()[0][0]


def test_dense_block_has_cliques(spark):
    """K6 + pendant: C(6,3)=20 triangles, C(6,4)=15 4-cliques, 6 5-cliques."""
    from itertools import combinations
    pairs = list(combinations(range(6), 2)) + [(5, 10)]
    df = spark.createDataFrame([(a, b) for a, b in pairs], "sid long, tid long")
    for counter in (clique_count_csr, clique_count_cogroup):
        assert counter(df, 3).collect()[0][0] == 20
        assert counter(df, 4).collect()[0][0] == 15
        assert counter(df, 5).collect()[0][0] == 6
        assert counter(df, 6).collect()[0][0] == 1
        assert counter(df, 7).collect()[0][0] == 0


def test_csr_beyond_regime_falls_back_to_cogroup(spark, monkeypatch):
    """Beyond the broadcast bound, clique_count_csr must route to the
    distributed cogroup kernel — NEVER to the path-materializing SQL
    plan (the blowup the kernels exist to avoid). SQL stays reachable
    only via clique_count(..., method='sql')."""
    import adopt_spark.algos.cliques as cl

    from itertools import combinations
    pairs = list(combinations(range(6), 2)) + [(5, 10)]
    df = spark.createDataFrame([(a, b) for a, b in pairs], "sid long, tid long")

    # force the beyond-regime path: the bound probe sees 16 edges > 2
    monkeypatch.setattr(cl, "CSR_BROADCAST_MAX_EDGES", 2)
    assert cl.build_oriented_csr(df) is None

    called = {}
    real = cl.clique_count_cogroup

    def spy(edges, k, _oriented=None):
        called["cogroup"] = True
        return real(edges, k, _oriented=_oriented)

    monkeypatch.setattr(cl, "clique_count_cogroup", spy)
    assert cl.clique_count_csr(df, 4).collect()[0]["n_cliques"] == 15
    assert called.get("cogroup") is True
