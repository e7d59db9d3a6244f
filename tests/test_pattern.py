"""Generic conjunctive-pattern counting — SQL generator, Catalyst
plan, and UCT executor must all agree with DuckDB on identical rows.

The reference evaluates ANY conjunctive query over edge(sid,tid)
(query/QueryInfo.java derives join variables from whatever equalities
the text contains); pattern_sql/pattern_query are this engine's
equivalent generality, so the differential here is three-way: DuckDB
on the generated SQL (oracle), Spark SQL on the same text (Catalyst
plan), and the sliced UCT episode executor (imperative plan).
"""

import duckdb
import pandas as pd
import pytest

from adopt_spark.algos.motifs import (
    DIAMOND, HOUSE, TAILED_TRIANGLE, count_pattern, pattern_sql,
)


def duck_count(pairs, sql):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs, columns=["sid", "tid"]))
    return con.execute(sql).fetchone()[0]


def brute_count(pairs, atoms, bounds=None):
    """Pure-python nested-loop evaluator: ground truth by definition."""
    edges = set(map(tuple, pairs))
    n = max(v for sv, tv, _ in atoms for v in (sv, tv))
    vids = sorted({v for e in edges for v in e})
    bounds = bounds or {}

    def rec(level, asg):
        if level > n:
            return 1
        total = 0
        for x in vids:
            if level in bounds and x >= bounds[level]:
                continue
            asg[level] = x
            ok = True
            for sv, tv, lt in atoms:
                if sv <= level and tv <= level:
                    s, t = asg[sv], asg[tv]
                    if (s, t) not in edges or (lt and not s < t):
                        ok = False
                        break
            if ok:
                total += rec(level + 1, asg)
        del asg[level]
        return total

    return rec(1, {})


@pytest.mark.parametrize("atoms", [DIAMOND, TAILED_TRIANGLE, HOUSE],
                         ids=["diamond", "tailed_tri", "house"])
def test_pattern_three_way(spark, powerlaw_small, atoms):
    df, pairs = powerlaw_small
    sql = pattern_sql(atoms)
    expected = brute_count(pairs, atoms)
    assert duck_count(pairs, sql) == expected
    assert count_pattern(spark, df, atoms).collect()[0]["n"] == expected


def test_pattern_bounds_replicated(spark, powerlaw_small):
    df, pairs = powerlaw_small
    bounds = {1: 120, 3: 200}
    sql = pattern_sql(DIAMOND, bounds=bounds)
    # every occurrence of a bounded variable carries its own predicate
    assert sql.count("< 120") == sum(
        (sv == 1) + (tv == 1) for sv, tv, _ in DIAMOND)
    expected = brute_count(pairs, DIAMOND, bounds)
    assert duck_count(pairs, sql) == expected
    assert count_pattern(spark, df, DIAMOND, bounds).collect()[0]["n"] \
        == expected


def test_uct_pattern_matches_sql(spark, powerlaw_small):
    from adopt_spark.algos.uct import pattern_query, uct_motif_count

    df, pairs = powerlaw_small
    expected = duck_count(pairs, pattern_sql(DIAMOND))
    for n_slices in (1, 4):
        total, info = uct_motif_count(spark, df, pattern_query(DIAMOND),
                                      n_slices=n_slices, seed=11)
        assert total == expected
        assert len(info.optimal_order) == 4


def test_pattern_validation():
    with pytest.raises(ValueError, match="disconnected"):
        pattern_sql([(1, 2, True), (3, 4, True)])
    with pytest.raises(ValueError, match="contiguous"):
        pattern_sql([(1, 3, True)])
    with pytest.raises(ValueError, match="self-loop"):
        pattern_sql([(1, 1, True)])
    with pytest.raises(ValueError, match="at least one"):
        pattern_sql([])
    with pytest.raises(ValueError, match="unknown variables"):
        pattern_sql(DIAMOND, bounds={9: 10})


def test_named_patterns_on_hand_graph(spark):
    # K4 on {1,2,3,4}: every lt pair is an edge.
    pairs = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    # diamond = 4-cycle 1<2<3<4 closing lt(1,4) + chord (1,3): in K4 the
    # only increasing labeling is (1,2,3,4) — exactly one match.
    assert count_pattern(spark, df, DIAMOND).collect()[0]["n"] == 1
    # tailed triangle needs a vertex above the triangle's max: triangles
    # (1,2,3)+tail 3->4 is the only one (tails from K4 itself reuse
    # cycle vertices, which the injectivity-free semantics allows only
    # via edges (3,4): triangle (1,2,3) tail 4; (1,2,4),(1,3,4),(2,3,4)
    # have max tails beyond 4 absent).
    assert count_pattern(spark, df, TAILED_TRIANGLE).collect()[0]["n"] \
        == brute_count(pairs, TAILED_TRIANGLE)
    assert count_pattern(spark, df, HOUSE).collect()[0]["n"] == 0
