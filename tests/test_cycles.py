"""Distributed n-cycle kernels vs DuckDB on the reference's encodings."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from adopt_spark.algos.cycles import (
    cycle4_count_cogroup, cycle_count, cycle_count_cogroup,
)
from adopt_spark.algos.motifs import cycle_sql


def duck_count(pairs, n=4):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs or [(0, 0)], columns=["sid", "tid"]))
    return con.execute(cycle_sql(n)).fetchone()[0]


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


# ---------- generalized kernel: n = 5, 6, 7 ----------

@pytest.mark.parametrize("n", [5, 6, 7])
@pytest.mark.parametrize("fixture", ["tri6", "two_components", "powerlaw_small"])
def test_cycle_n_kernel_vs_duckdb(spark, n, fixture, request):
    df, pairs = request.getfixturevalue(fixture)
    got = cycle_count_cogroup(df, n).collect()[0]["n_cycles"]
    assert got == duck_count(pairs, n)


@pytest.mark.parametrize("n", [5, 6, 7])
def test_cycle_n_exact_ring(spark, n):
    # one increasing ring 1..n closed per the encoding: raw (v1, vn) for
    # n=5, lt (v1, vn) for n>=6 — the chain itself is 1->2->...->n
    pairs = [(i, i + 1) for i in range(1, n)] + [(1, n)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    assert cycle_count_cogroup(df, n).collect()[0][0] == 1
    assert duck_count(pairs, n) == 1
    # removing the closing edge leaves a bare path: zero cycles
    open_pairs = pairs[:-1]
    df2 = spark.createDataFrame(open_pairs, "sid long, tid long")
    assert cycle_count_cogroup(df2, n).collect()[0][0] == 0


def test_cycle5_closing_direction(spark):
    # 5-cycle closes with RAW (v1, v5); the reversed edge must not close
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert duck_count(chain + [(1, 5)], 5) == 1
    assert duck_count(chain + [(5, 1)], 5) == 0
    df_fwd = spark.createDataFrame(chain + [(1, 5)], "sid long, tid long")
    df_rev = spark.createDataFrame(chain + [(5, 1)], "sid long, tid long")
    assert cycle_count_cogroup(df_fwd, 5).collect()[0][0] == 1
    assert cycle_count_cogroup(df_rev, 5).collect()[0][0] == 0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)),
                      min_size=0, max_size=60, unique=True))
def test_cycle5_property(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "sid long, tid long")
    assert cycle_count_cogroup(df, 5).collect()[0][0] == duck_count(pairs, 5)


@pytest.mark.parametrize("n", [4, 5])
def test_cycle_auto_matches_oracle(spark, powerlaw_small, n):
    df, pairs = powerlaw_small
    assert cycle_count(df, n, "auto").collect()[0][0] == duck_count(pairs, n)
    assert cycle_count(df, n, "sql").collect()[0][0] == duck_count(pairs, n)
