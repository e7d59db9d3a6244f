"""dq_report: each constraint kind against a table with known dirt."""

from __future__ import annotations

import pytest

from adopt_spark.functions.quality_checks import dq_report


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # (id, status, price, prio, cust)
        (1, "O", 100.0, "1-URGENT", 10),
        (2, "F", 200.0, "5-LOW", 11),
        (2, "P", 300.0, "2-HIGH", 12),      # duplicate id
        (3, "X", -5.0, "9-BAD", None),      # bad status, range, regex, null
        (4, None, 700.0, "3-MEDIUM", 99),   # null status ok-ish, range, bad fk
        (None, "O", 50.0, None, 10),        # null id
    ]
    return spark.createDataFrame(
        rows, "id long, status string, price double, prio string, cust long")


def test_dq_report_counts(spark, dirty):
    ref = spark.createDataFrame([(10,), (11,), (12,)], "ck long")
    rep = {r.constraint: r for r in dq_report(dirty, [
        ("not_null", "id"),
        ("unique", "id"),
        ("accepted_values", "status", ["O", "F", "P"]),
        ("range", "price", 0, 600),
        ("regex", "prio", "^[1-5]-"),
        ("fk", "cust", ref, "ck"),
    ]).collect()}
    assert rep["not_null:id"].n_violations == 1
    assert rep["unique:id"].n_violations == 1          # id=2 twice
    assert rep["accepted_values:status"].n_violations == 1   # 'X'
    assert rep["range:price"].n_violations == 2        # -5, 700
    assert rep["regex:prio"].n_violations == 1         # '9-BAD'
    assert rep["fk:cust"].n_violations == 1            # 99
    assert all(not r.passed for r in rep.values())


def test_dq_report_clean_passes(spark):
    clean = spark.createDataFrame([(1, "O"), (2, "F")], "id long, s string")
    rep = dq_report(clean, [
        ("not_null", "id"), ("unique", "id"),
        ("accepted_values", "s", ["O", "F"]),
    ]).collect()
    assert all(r.passed and r.n_violations == 0 for r in rep)


def test_dq_report_fused_single_scan(spark, dirty):
    # all row-local constraints compile into ONE aggregate over ONE scan
    plan = dq_report(dirty, [
        ("not_null", "id"), ("accepted_values", "status", ["O"]),
        ("range", "price", 0, 600), ("regex", "prio", "^[1-5]-"),
    ])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_dq_report_unknown_kind(spark, dirty):
    with pytest.raises(ValueError):
        dq_report(dirty, [("nope", "id")])


def test_dq_report_empty_table(spark):
    empty = spark.createDataFrame([], "id long")
    rep = dq_report(empty, [("not_null", "id"), ("unique", "id")]).collect()
    assert all(r.n_violations == 0 and r.passed for r in rep)
