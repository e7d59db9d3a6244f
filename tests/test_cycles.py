"""Distributed 4-cycle kernel vs DuckDB on the reference's encoding."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from adopt_spark.algos.cycles import cycle4_count_cogroup
from adopt_spark.algos.motifs import cycle_sql


def duck_count(pairs):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs or [(0, 0)], columns=["sid", "tid"]))
    return con.execute(cycle_sql(4)).fetchone()[0]


@pytest.mark.parametrize("fixture", ["tri6", "two_components", "powerlaw_small"])
def test_cycle4_kernel_vs_duckdb(spark, fixture, request):
    df, pairs = request.getfixturevalue(fixture)
    got = cycle4_count_cogroup(df).collect()[0]["n_cycles"]
    assert got == duck_count(pairs)


def test_square_has_one_increasing_cycle(spark):
    # 1-2-3-4 square closed by the directed raw edge (4,1)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    assert cycle4_count_cogroup(df).collect()[0][0] == 1
    assert duck_count(pairs) == 1
    # closing edge direction matters: (1,4) instead of (4,1) also closes
    # (the reference's e4 has no lt filter, either orientation of the raw
    # edge with sid=v4 works only as (v4, v1))
    pairs2 = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert duck_count(pairs2) == 0
    df2 = spark.createDataFrame(pairs2, "sid long, tid long")
    assert cycle4_count_cogroup(df2).collect()[0][0] == 0


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                      min_size=0, max_size=50, unique=True))
def test_cycle4_property(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "sid long, tid long")
    assert cycle4_count_cogroup(df).collect()[0][0] == duck_count(pairs)
