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


# ---------------------------------------------------------------------------
# directed selectivity families (graph_selectivity_query encoding)

from adopt_spark.algos.motifs import (  # noqa: E402
    cycle_sql, selectivity_bounds, selectivity_clique_sql, selectivity_cycle_sql,
)

REF_SEL = "/root/reference/graph_selectivity_query"
TWITTER_DOMAIN = 570_000_000   # the files' 1.0-selectivity bound


def _file_bounds(fname: str) -> dict[int, int]:
    """a0.25_b0.5_d0.75.sql -> {1: .., 2: .., 4: ..} (c -> v3), using
    the shipped per-fraction constants (ego-Twitter id quantiles)."""
    from adopt_spark.algos.motifs import TWITTER_SELECTIVITY_BOUNDS

    var_of = {"a": 1, "b": 2, "c": 3, "d": 4}
    out = {}
    for part in fname.removesuffix(".sql").split("_"):
        out[var_of[part[0]]] = TWITTER_SELECTIVITY_BOUNDS[float(part[1:])]
    return out


def _random_wide_graph(seed: int, n_edges: int = 80):
    """Random directed graph whose vertex ids span the twitter domain,
    drawn from few distinct ids so motifs actually occur."""
    import numpy as np
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, TWITTER_DOMAIN, size=12)
    e = rng.integers(0, len(ids), size=(n_edges, 2))
    return pd.DataFrame({"sid": ids[e[:, 0]], "tid": ids[e[:, 1]]}).drop_duplicates()


@pytest.mark.parametrize("family,gen,n", [
    ("twitter_selectivity_3clique", selectivity_clique_sql, 3),
    ("twitter_selectivity_4clique", selectivity_clique_sql, 4),
    ("twitter_selectivity_5clique", selectivity_clique_sql, 5),
    ("twitter_selectivity_6clique", selectivity_clique_sql, 6),
    ("twitter_selectivity_4cycle", selectivity_cycle_sql, 4),
    ("twitter_selectivity_5cycle", selectivity_cycle_sql, 5),
])
def test_generator_matches_reference_files(family, gen, n):
    """Run 4 shipped reference files verbatim in DuckDB next to the
    generator's SQL with the same (filename-decoded) bounds, on random
    graphs whose ids make the bounds selective: equal counts = the
    generator reproduces the shipped family's semantics."""
    import os
    d = os.path.join(REF_SEL, family, "sql")
    files = sorted(os.listdir(d))
    picks = [files[0], files[17], files[40], files[-1]]
    for seed in (3, 11):
        graph = _random_wide_graph(seed)
        con = duckdb.connect()
        con.register("edge", graph)
        for fname in picks:
            ref_sql = open(os.path.join(d, fname)).read().strip().rstrip(";")
            mine = gen(n, bounds=_file_bounds(fname))
            ref_n = con.execute(ref_sql).fetchone()[0]
            my_n = con.execute(mine).fetchone()[0]
            assert my_n == ref_n, (family, fname, seed)


@pytest.mark.parametrize("fracs", [
    {1: 0.25, 2: 0.25, 4: 0.25},
    {1: 0.5, 2: 0.75, 4: 1.0},
])
@pytest.mark.parametrize("gen,n", [
    (selectivity_clique_sql, 3),
    (selectivity_cycle_sql, 4),
    (selectivity_cycle_sql, 5),
])
def test_directed_selectivity_spark_vs_duckdb(spark, powerlaw_small,
                                              gen, n, fracs):
    df, pairs = powerlaw_small
    max_id = max(max(a, b) for a, b in pairs) + 1
    fr = {v: f for v, f in fracs.items() if v <= n}
    sql = gen(n, bounds=selectivity_bounds(fr, max_id))
    got = run_motif(spark, df, sql).collect()[0]["n"]
    assert got == duck_count(pairs, sql)


@pytest.mark.parametrize("n", [4, 5])
def test_ordered_cycle_range_preds(spark, powerlaw_small, n):
    """range_preds on the ordered cycle encoding (cycle_sql), the
    in-suite analogue of the 4/5-cycle selectivity families."""
    df, pairs = powerlaw_small
    max_id = max(max(a, b) for a, b in pairs) + 1
    preds = {1: int(0.5 * max_id), 2: int(0.75 * max_id), n: max_id}
    sql = cycle_sql(n, range_preds=preds)
    got = run_motif(spark, df, sql).collect()[0]["n"]
    assert got == duck_count(pairs, sql)
    # tighter v1 bound shrinks the count monotonically
    tight = cycle_sql(n, range_preds={1: int(0.25 * max_id)})
    loose = cycle_sql(n, range_preds={1: max_id})
    assert duck_count(pairs, tight) <= duck_count(pairs, loose)
