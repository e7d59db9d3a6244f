"""Bucketed graph layouts: correctness + the exchange-free property.

The whole point of the layout investment (the reference's trie-cache
analogue) is that subsequent key-aligned plans contain NO Exchange —
asserted on the physical plan string, with broadcast disabled so the
check exercises the sort-merge path a 100 TB table would take.
"""

import pytest
from pyspark.sql import functions as F

from adopt_spark.layout import (
    degrees_from_layout, load_layout, materialize_graph_layout,
)


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    pairs = [(i, (i * 7 + 1) % 50) for i in range(200)] + [(3, 4), (4, 5), (3, 5)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    path = str(tmp_path_factory.mktemp("layout"))
    tables = materialize_graph_layout(spark, df, path, prefix="tg", buckets=8)
    return df, tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_layout_roundtrip_counts(spark, layout):
    df, tables = layout
    loaded = load_layout(spark, tables)
    n = df.where("sid != tid").dropDuplicates(["sid", "tid"]).count()
    assert loaded["fwd"].count() == n
    assert loaded["rev"].count() == n
    # oriented = lt-filtered pair set, one row per undirected pair
    lt = df.where("sid < tid").dropDuplicates(["sid", "tid"]).count()
    assert loaded["oriented"].count() <= lt
    assert set(loaded["oriented"].columns) == {"src", "dst"}


def test_bucketed_self_join_has_no_exchange(spark, layout):
    _, tables = layout
    fwd = spark.table(tables["fwd"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = fwd.alias("a").join(
            spark.table(tables["fwd"]).alias("b"), "sid")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, layout):
    _, tables = layout
    deg = degrees_from_layout(spark, tables)
    plan = _plan(deg)
    assert "Exchange" not in plan, plan
    # degree values correct vs a straight computation
    df = spark.table(tables["fwd"])
    expected = {r["sid"]: r["n"] for r in
                df.groupBy("sid").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["v"]: r["outdeg"] for r in deg.collect()}
    assert got == expected


def test_cross_layout_join_on_bucket_keys_no_exchange(spark, layout):
    """fwd (bucketed by sid) ⋈ rev (bucketed by tid) on sid = tid:
    both sides pre-bucketed on their join key → zero exchanges."""
    _, tables = layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fwd = spark.table(tables["fwd"]).select(F.col("sid"), F.col("tid").alias("t1"))
        rev = spark.table(tables["rev"]).select(F.col("tid"), F.col("sid").alias("s2"))
        wedges = fwd.join(rev, fwd["sid"] == rev["tid"])
        plan = _plan(wedges)
        assert "Exchange" not in plan, plan
        assert wedges.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_wcoj_kernels_consume_oriented_layout(spark, layout):
    """The trie-cache amortization end-to-end: the cogroup leapfrog
    kernels accept the pre-oriented bucketed layout as their input —
    the adjacency groupBy('src') aggregates the bucketed table with NO
    Exchange, and counts match the from-scratch kernels."""
    edges, tables = layout
    from adopt_spark.algos.cliques import clique_count_cogroup
    from adopt_spark.algos.triangles import (
        triangle_count_cogroup, triangle_count_join,
    )

    o = spark.table(tables["oriented"])
    # adjacency build over the layout is exchange-free
    adj = o.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    assert "Exchange" not in _plan(adj), _plan(adj)
    # kernel over the layout == kernel from scratch == join strategy
    expected = triangle_count_join(edges).collect()[0][0]
    got_layout = triangle_count_cogroup(edges, _oriented=o).collect()[0][0]
    got_scratch = triangle_count_cogroup(edges).collect()[0][0]
    assert got_layout == got_scratch == expected
    k4_layout = clique_count_cogroup(edges, 4, _oriented=o).collect()[0][0]
    k4_scratch = clique_count_cogroup(edges, 4).collect()[0][0]
    assert k4_layout == k4_scratch
