"""Hand-case tests for the sequence/seasonality analytics entries
(trigram paths, attribution, power-law alpha)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Window, functions as F


def test_attribution_hand_case(spark):
    # user 1: view -> click -> purchase  (first=view, last=click)
    # user 2: click -> purchase -> view -> purchase
    #         (both purchases: first=click; lasts = click, view)
    # user 3: purchase alone (no prev -> excluded)
    rows = [
        (1, "view", 1, 1), (1, "click", 2, 2), (1, "purchase", 3, 3),
        (2, "click", 1, 4), (2, "purchase", 2, 5), (2, "view", 3, 6),
        (2, "purchase", 4, 7),
        (3, "purchase", 1, 8),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, t long, event_id long")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = (ev.withColumn("first_touch", F.first("event_type").over(w))
           .withColumn("prev", F.lag("event_type", 1).over(w)))
    out = {(r.first_touch, r.last_touch): r.n for r in
           (seq.where(F.col("event_type") == "purchase")
            .where(F.col("prev").isNotNull())
            .groupBy("first_touch", F.col("prev").alias("last_touch"))
            .agg(F.count(F.lit(1)).alias("n"))).collect()}
    assert out == {("view", "click"): 1, ("click", "click"): 1,
                   ("click", "view"): 1}


def test_trigram_sequences_hand_case(spark):
    rows = [(1, "a", 1, 1), (1, "b", 2, 2), (1, "c", 3, 3),
            (1, "d", 4, 4), (2, "a", 1, 5), (2, "b", 2, 6)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, t long, event_id long")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    tri = (ev.withColumn("e2", F.lead("event_type", 1).over(w))
           .withColumn("e3", F.lead("event_type", 2).over(w))
           .where(F.col("e3").isNotNull())
           .select(F.col("event_type").alias("e1"), "e2", "e3"))
    got = {(r.e1, r.e2, r.e3) for r in tri.collect()}
    # user 1 contributes (a,b,c) and (b,c,d); user 2 has only 2 events
    assert got == {("a", "b", "c"), ("b", "c", "d")}


def test_powerlaw_alpha_known_degrees(spark):
    """alpha = 1 + n / sum(ln d) on a fixed degree multiset — star
    K_{1,4}: center degree 4, four leaves degree 1."""
    edges = [(0, i) for i in range(1, 5)]
    e = spark.createDataFrame(edges, "sid long, tid long")
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("w"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("w"))).distinct())
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    out = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(1.0 + F.count(F.lit(1))
                / F.sum(F.log(F.col("d").cast("double"))), 6)
         .alias("alpha")).collect()[0]
    assert out.n == 5
    assert out.alpha == pytest.approx(1 + 5 / math.log(4), abs=1e-6)


def test_user_growth_laws(spark):
    """New-user histogram + running total replayed by hand."""
    import datetime

    from unittest import mock

    from adopt_spark.queries import registry as R

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # users 1-3 first appear day 0 (user 1 again day 2), user 4 day 1,
    # user 5 day 2
    for uid, d in ((1, 0), (2, 0), (3, 0), (1, 2), (4, 1), (5, 2)):
        rows.append((eid, t0 + datetime.timedelta(days=d), uid, "a", 1.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {r.day: (r.new_users, r.total_users)
               for r in R.q_user_growth(spark, "x").collect()}
    days = sorted(got)
    assert [got[d] for d in days] == [(3, 3), (1, 4), (1, 5)]
