"""Property-based differential test: on arbitrary small graphs, every
triangle strategy and the k-clique kernels agree with DuckDB running
the reference's own SQL encoding. Randomized structure catches shapes
the fixed fixtures don't (isolated stars, multi-edges fed as raw
input, near-bipartite blocks).
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from adopt_spark.algos.cliques import clique_count
from adopt_spark.algos.motifs import clique_sql
from adopt_spark.algos.triangles import triangle_count

# unique=True: the engine treats edge(sid,tid) as a SET (dropDuplicates
# on every path, DISTINCT in the derived-edge oracle CTE), while SQL
# count(*) over a multiset table multiplies per duplicate row — feeding
# duplicate rows would compare two different (both valid) semantics.
edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0, max_size=60, unique=True,
)


def duck_count(pairs, sql):
    con = duckdb.connect()
    con.register("edge", pd.DataFrame(pairs or [(0, 0)], columns=["sid", "tid"]))
    return con.execute(sql).fetchone()[0]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=edges_strategy)
def test_all_triangle_strategies_match_duckdb(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "sid long, tid long")
    expected = duck_count(pairs, clique_sql(3))
    for method in ("join", "csr", "cogroup", "auto"):
        assert triangle_count(df, method).collect()[0][0] == expected, method


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=edges_strategy)
def test_4clique_kernels_match_duckdb(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "sid long, tid long")
    expected = duck_count(pairs, clique_sql(4))
    for method in ("csr", "cogroup"):
        assert clique_count(df, 4, method).collect()[0][0] == expected, method
