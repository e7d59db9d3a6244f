"""Physical-plan shape assertions — the 100 TB checklist.

A plan that reads all columns for a 2-column projection, or misses a
broadcast for a 25-row dimension table, is wrong regardless of local
wall time. These tests pin the plan properties the engine relies on.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = physical_plan(q)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,30" in plan


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_partkey")
    plan = physical_plan(q)
    # ReadSchema must contain only the 2 projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_partkey" in read_schema
    assert "l_extendedprice" not in read_schema and "l_shipdate" not in read_schema


def test_small_dimension_join_broadcasts(spark):
    n = spark.read.parquet(f"{SF}/nation.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    q = c.join(n, c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in physical_plan(q)


def test_topk_plans_take_ordered(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    q = o.orderBy(F.desc("o_totalprice")).limit(5)
    assert "TakeOrderedAndProject" in physical_plan(q)


def test_whole_stage_codegen_active(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (li.groupBy("l_returnflag")
         .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))))
    q.collect()          # AQE finalizes the plan only on execution
    # codegen'd operators carry the "*(n)" prefix in Spark 4 plan strings
    assert "*(1)" in physical_plan(q)


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must partial-aggregate map-side (the reference's
    single-threaded GroupBy has no such notion — Spark's is free)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_partkey").agg(F.sum("l_quantity"))
    plan = physical_plan(q)
    assert plan.count("HashAggregate") >= 2        # partial + final


def test_motif_join_reuses_lt_filter_pushdown(spark):
    """The sid<tid predicate of motif queries must reach every scan."""
    from adopt_spark.algos.motifs import clique_sql
    from adopt_spark.edges import derived_edges

    derived_edges(spark, SF).createOrReplaceTempView("edge")
    q = spark.sql(clique_sql(3))
    plan = optimized_plan(q)
    # the lt-filter appears as a pushed filter on each alias branch
    assert plan.count("(sid") + plan.count("(tid") >= 3


def test_q6_all_range_filters_pushed(spark):
    """TPC-H Q6 shape: every range predicate must reach the parquet
    scan and ReadSchema must carry only the 4 referenced columns."""
    from adopt_spark.queries.registry import q_q6_forecast

    df = q_q6_forecast(spark, SF)
    # formatted explain prints PushedFilters untruncated
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount,0.05",
                 "LessThanOrEqual(l_discount,0.07",
                 "LessThan(l_quantity,24"):
        assert frag in plan, frag
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema and "l_orderkey" not in read_schema


def test_asof_bucketed_carry_join_is_summary_sized(spark):
    """The bucketed asof's carry pass must window BUCKET summaries,
    not rows: its plan partitions windows by the by-key only at the
    summary level, and the final window partitions by (key, bucket)."""
    from adopt_spark.functions.interval import asof_join_bucketed

    ldf = spark.createDataFrame([(1, 0, 5)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(0, 3, 9)], "k long, t long, rid long")
    out = asof_join_bucketed(ldf, rdf, on="t", by=["k"], right_cols=["rid"],
                             bucket_width=10)
    plan = physical_plan(out)
    # final window keyed by (k, _bkt) -> monster keys split across buckets
    assert "windowspecdefinition(k" in plan and "_bkt" in plan


def test_round3_ops_plan_shape(spark):
    """Round-3 operators: partial (map-side) aggregation present, no
    cartesian product, no per-row Python eval anywhere in the plan."""
    from adopt_spark.edges import bipartite_project
    from adopt_spark.functions.sampling import stratified_sample
    from adopt_spark.functions.text import doc_repetition, tfidf_top_terms

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    proj = bipartite_project(li, "l_orderkey", "l_partkey",
                             min_weight=2, max_group_size=16)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for q in (proj,
              tfidf_top_terms(docs, k=3),
              doc_repetition(docs)):
        plan = physical_plan(q)
        assert "HashAggregate" in plan
        assert "partial" in plan.lower()      # map-side combine
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan  # no per-row Python
        assert "ArrowEvalPython" not in plan  # and no pandas UDF either


def test_stratified_sample_is_narrow_filter(spark):
    """The sample gate must stay a scan-level filter: no shuffle
    (Exchange) and no Python in the plan."""
    from adopt_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = stratified_sample(docs.select("doc_id", "lang"), "doc_id",
                          "lang", {"en": 200, "zh": 800}, 500)
    plan = physical_plan(q)
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "Filter" in plan


def test_round3_session_ops_plan_quality(spark):
    """The newest operators must keep the kernel discipline: no
    cartesian product, no per-row Python, map-side partial agg where
    an aggregate exists."""
    from adopt_spark.functions.editdist import edit_distance_join
    from adopt_spark.functions.text import unigram_logprob
    from adopt_spark.functions.transitions import event_transitions

    parts = spark.read.parquet(f"{SF}/part.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for q in (edit_distance_join(parts, "p_name", 2),
              unigram_logprob(docs),
              event_transitions(ev)):
        plan = physical_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # the vocabulary join in unigram scoring must broadcast, not shuffle
    plan = physical_plan(unigram_logprob(docs))
    assert "BroadcastHashJoin" in plan


def test_stats_layer_plan_shape(spark):
    """Session-3 statistics operators: map-side partial aggregation,
    no cartesian joins (the scalar broadcasts are BroadcastNestedLoop
    over 1-row frames, not CartesianProduct), and zero Python eval —
    the whole layer is JVM-side Column arithmetic."""
    from adopt_spark.functions.stats import (
        ks_2sample, mann_whitney_u, welch_ttest)
    from adopt_spark.queries.registry import (
        q_corr_matrix, q_dataset_split, q_mutual_info)

    ev = spark.read.parquet(f"{SF}/events.parquet")
    for q in (ks_2sample(ev, "event_type", "value", "click", "purchase"),
              mann_whitney_u(ev, "event_type", "value", "view", "signup"),
              welch_ttest(ev, "event_type", "value", "click", "error"),
              q_corr_matrix(spark, SF),
              q_mutual_info(spark, SF),
              q_dataset_split(spark, SF)):
        plan = physical_plan(q)
        assert "HashAggregate" in plan
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_corr_matrix_single_scan(spark):
    """All pairwise moments must come from ONE scan of lineitem."""
    from adopt_spark.queries.registry import q_corr_matrix

    plan = physical_plan(q_corr_matrix(spark, SF))
    assert plan.count("FileScan parquet") == 1


def test_session10_ops_plan_shape(spark):
    """Session-10 plan claims, asserted on the physical plan:
    chunk_documents is shuffle-free (pure map stage); dep_impact and
    bom_explode aggregate with map-side partial agg and never plan a
    Cartesian product or Python eval in the hot path."""
    from adopt_spark.functions.bom import bom_explode, synthetic_bom
    from adopt_spark.functions.deps import (
        dep_edges, dep_impact, semver_resolve, synthetic_releases,
        synthetic_requirements)
    from adopt_spark.functions.export import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    chunk_plan = physical_plan(chunk_documents(docs, 32, 24))
    assert "Exchange" not in chunk_plan           # zero shuffle
    assert "BatchEvalPython" not in chunk_plan
    assert "ArrowEvalPython" not in chunk_plan

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    res = semver_resolve(synthetic_requirements(orders, thin=13),
                         synthetic_releases(part))
    for df in (dep_impact(dep_edges(res), 2),
               bom_explode(synthetic_bom(part), 4)):
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
