"""SCD type-2 merge: all paths vs a hand-computed expectation."""

import datetime

from adopt_spark.functions.scd import scd2_merge

D = datetime.date


def run(spark, cur_rows, upd_rows):
    cur = spark.createDataFrame(
        cur_rows, "k long, a string, valid_from date, valid_to date")
    upd = spark.createDataFrame(upd_rows, "k long, a string, eff_date date")
    out = scd2_merge(cur, upd, "k", "a")
    return {tuple(r) for r in out.collect()}


def test_scd2_all_paths(spark):
    cur = [
        (1, "x", D(2020, 1, 1), None),   # will change
        (2, "y", D(2020, 1, 1), None),   # update equals current -> keep
        (3, "z", D(2020, 1, 1), None),   # not in batch -> keep
        (4, None, D(2020, 1, 1), None),  # NULL attr, update NULL -> keep
    ]
    upd = [
        (1, "x2", D(2021, 6, 1)),
        (2, "y", D(2021, 6, 1)),
        (4, None, D(2021, 6, 1)),
        (9, "new", D(2021, 6, 1)),       # brand-new key
    ]
    got = run(spark, cur, upd)
    assert got == {
        (1, "x", D(2020, 1, 1), D(2021, 6, 1)),   # closed
        (1, "x2", D(2021, 6, 1), None),           # reopened
        (2, "y", D(2020, 1, 1), None),            # unchanged
        (3, "z", D(2020, 1, 1), None),            # untouched
        (4, None, D(2020, 1, 1), None),           # NULL-safe unchanged
        (9, "new", D(2021, 6, 1), None),          # inserted
    }


def test_scd2_null_to_value_changes(spark):
    cur = [(1, None, D(2020, 1, 1), None)]
    upd = [(1, "v", D(2022, 1, 1))]
    got = run(spark, cur, upd)
    assert got == {
        (1, None, D(2020, 1, 1), D(2022, 1, 1)),
        (1, "v", D(2022, 1, 1), None),
    }


def test_scd2_empty_batch_is_identity(spark):
    cur = [(1, "x", D(2020, 1, 1), None), (2, "y", D(2020, 1, 1), None)]
    got = run(spark, cur, [])
    assert got == {(1, "x", D(2020, 1, 1), None),
                   (2, "y", D(2020, 1, 1), None)}
