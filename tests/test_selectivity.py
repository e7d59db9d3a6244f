"""Selectivity-variant grid — the reference's graph_selectivity_query
corpus pattern (twitter_selectivity_{n}clique/sql/a{x}_b{y}_c{z}.sql:
the motif query plus one upper bound per join variable at fractions of
the id domain). Here: the same parameterization over the powerlaw
fixture, every variant differentially checked against DuckDB.
"""

import duckdb
import pandas as pd
import pytest

from adopt_spark.algos.motifs import clique_sql, run_motif


def duck_count(pairs, sql):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs, columns=["sid", "tid"]))
    return con.execute(sql).fetchone()[0]


# fractions of the id domain per variable, as in a0.25_b0.5_c0.75.sql
GRID = [
    (0.25, 0.25, 0.25),
    (0.25, 0.5, 1.0),
    (0.5, 0.75, 0.25),
    (1.0, 1.0, 1.0),       # degenerate: equals the unbounded 3-clique
]


@pytest.mark.parametrize("fractions", GRID)
def test_3clique_selectivity_grid(spark, powerlaw_small, fractions):
    df, pairs = powerlaw_small
    max_id = max(max(a, b) for a, b in pairs) + 1
    preds = {i + 1: int(f * max_id) + 1 for i, f in enumerate(fractions)}
    sql = clique_sql(3, range_preds=preds)
    got = run_motif(spark, df, sql).collect()[0]["n"]
    assert got == duck_count(pairs, sql)


def test_selectivity_reduces_monotonically(spark, powerlaw_small):
    """Tighter bounds can only shrink the count."""
    df, pairs = powerlaw_small
    max_id = max(max(a, b) for a, b in pairs) + 1
    counts = []
    for frac in (0.25, 0.5, 1.0):
        preds = {1: int(frac * max_id) + 1}
        counts.append(run_motif(spark, df,
                                clique_sql(3, range_preds=preds)).collect()[0]["n"])
    assert counts == sorted(counts)
