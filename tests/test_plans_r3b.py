"""Physical-plan shape assertions for the round-3 session 23-26
operators: no accidental cross products on data-sized frames (the
only nested-loop joins allowed are the documented broadcasts of
1-row/constants frames), broadcasts where a side is provably small,
map-side partial aggregation on the merge paths."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _edges(spark, n=300):
    return spark.range(n).select(
        (F.col("id") % 53).alias("sid"),
        ((F.col("id") * 7 + 3) % 53).alias("tid"))


def test_structural_equiv_partial_agg_no_cartesian(spark):
    from adopt_spark.algos.vertex_metrics import structural_equiv

    plan = physical_plan(structural_equiv(_edges(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # adjacency build and the array group-by both partial-aggregate
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_local_sparsify_equi_joins_only(spark):
    from adopt_spark.algos.sparsify import local_sparsify

    plan = physical_plan(local_sparsify(_edges(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_dsir_broadcasts_the_vocabulary(spark):
    from adopt_spark.functions.sampling import dsir_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(dsir_sample(docs))
    # vocab + totals reach the token stream as broadcasts, never a
    # shuffle of the corpus against the model
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_nb_sparse_join_is_broadcast(spark):
    from adopt_spark.functions.classify import nb_lang_confusion

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(nb_lang_confusion(docs))
    assert "BroadcastHashJoin" in plan       # cf model onto test tokens
    assert "CartesianProduct" not in plan
    # the only nested-loops are the documented constant broadcasts:
    # vocab (1 row) and n_train (1 row) onto the lang-count frame,
    # and the doc x classes frame (classes = a handful of langs) —
    # never a data-sized side
    assert plan.count("BroadcastNestedLoopJoin") <= 3


def test_license_exposure_no_cartesian(spark):
    from adopt_spark.functions.deps import license_exposure

    edges = spark.createDataFrame(
        [(f"repo{i}", f"repo{(i * 3 + 1) % 40}") for i in range(40)],
        "src string, dst string")
    plan = physical_plan(license_exposure(edges, max_hops=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_quantile_bins_broadcasts_cuts_and_partial_aggs(spark):
    from adopt_spark.functions.stats import quantile_bins

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = physical_plan(quantile_bins(ev))
    assert "CartesianProduct" not in plan
    # the cuts frame is ONE row — its broadcast nested loop is the
    # intended plan; the report aggregate partial-aggregates
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "HashAggregate" in plan


def test_ppr_sweep_curve_no_cartesian(spark):
    from adopt_spark.algos.localcom import ppr_sweep

    curve = ppr_sweep(spark, _edges(spark), iters=3)
    plan = physical_plan(curve)
    assert "CartesianProduct" not in plan
    # totals frame is 1 row (documented broadcast)
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_refex_roles_no_cartesian(spark):
    from adopt_spark.algos.roles import refex_roles

    plan = physical_plan(refex_roles(_edges(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_tfidf_sim_is_term_keyed_not_doc_cross(spark):
    from unittest import mock

    from adopt_spark.queries import registry as R

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with mock.patch.object(R, "_t", lambda s_, sf, name: docs):
        plan = physical_plan(R.q_tfidf_sim(spark, "x"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan     # term equi-joins only


def test_item_recs_no_cartesian(spark):
    from unittest import mock

    from adopt_spark.queries import registry as R

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    with mock.patch.object(R, "_t", lambda s_, sf, name: li):
        plan = physical_plan(R.q_item_recs(spark, "x"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_cuped_single_pass_aggregates(spark):
    from unittest import mock

    from adopt_spark.queries import registry as R

    ev = spark.read.parquet(f"{SF}/events.parquet")
    with mock.patch.object(R, "_t", lambda s_, sf, name: ev):
        plan = physical_plan(R.q_cuped(spark, "x"))
    assert "CartesianProduct" not in plan
    # median (re-planned per consumer branch) + moments frames are
    # 1-row broadcasts — never a data-sized side
    assert plan.count("BroadcastNestedLoopJoin") <= 3


def test_balance_census_equi_join_triangle(spark):
    from unittest import mock

    from adopt_spark.queries import registry as R

    df = spark.createDataFrame([(0, 1), (1, 2), (0, 2)],
                               "sid long, tid long")
    with mock.patch.object(R, "derived_edges", lambda s_, sf: df):
        plan = physical_plan(R.q_balance_census(spark, "x"))
    assert "CartesianProduct" not in plan
