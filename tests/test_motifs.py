"""Motif SQL generator vs DuckDB on identical edge data.

This is the reference's own correctness surface: the generated
n-clique/n-cycle queries must count exactly what the reference's
graph_query/*.sql count — verified differentially by running the SAME
generated SQL in DuckDB over the same rows.
"""

import duckdb
import pandas as pd
import pytest

from adopt_spark.algos.motifs import clique_sql, count_clique, count_cycle, cycle_sql
from adopt_spark.algos.triangles import triangle_count


def duck_count(pairs, sql):
    con = duckdb.connect()
    edge = pd.DataFrame(pairs, columns=["sid", "tid"])
    con.register("edge", edge)
    return con.execute(sql).fetchone()[0]


@pytest.mark.parametrize("n", [3, 4])
def test_clique_counts(spark, powerlaw_small, n):
    df, pairs = powerlaw_small
    sql = clique_sql(n)
    expected = duck_count(pairs, sql)
    got = count_clique(spark, df, n).collect()[0]["n"]
    assert got == expected


@pytest.mark.parametrize("n", [4, 5, 6])
def test_cycle_counts(spark, tri6, n):
    df, pairs = tri6
    sql = cycle_sql(n)
    expected = duck_count(pairs, sql)
    got = count_cycle(spark, df, n).collect()[0]["n"]
    assert got == expected


def test_cycle_counts_powerlaw(spark, powerlaw_small):
    df, pairs = powerlaw_small
    for n in (4,):
        expected = duck_count(pairs, cycle_sql(n))
        got = count_cycle(spark, df, n).collect()[0]["n"]
        assert got == expected


def test_3clique_equals_triangle_impls(spark, powerlaw_small):
    df, pairs = powerlaw_small
    via_sql = count_clique(spark, df, 3).collect()[0]["n"]
    assert triangle_count(df, "join").collect()[0][0] == via_sql
    assert triangle_count(df, "csr").collect()[0][0] == via_sql


def test_range_motif(spark, powerlaw_small):
    df, pairs = powerlaw_small
    preds = {1: 75, 2: 150, 3: 225}  # ~a0.25_b0.5_c0.75 selectivity variant
    sql = clique_sql(3, range_preds=preds)
    expected = duck_count(pairs, sql)
    got = count_clique(spark, df, 3, range_preds=preds).collect()[0]["n"]
    assert got == expected
