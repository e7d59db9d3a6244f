"""Gaps-and-islands + time-weighted average vs hand expectations."""

import datetime

from pyspark.sql import functions as F

from adopt_spark.queries.registry import q_id_islands, q_twa_value


def _events(spark, rows, tmp_path):
    # (event_id, user_id, ts_micros_offset, value)
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, u, base + datetime.timedelta(microseconds=t), "x", float(v),
          "{}")
         for i, u, t, v in rows],
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double, props string")
    # registry queries read parquet from a dir: write a mini fixture
    df.select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_islands_hand_case(spark, tmp_path):
    rows = [
        # user 1: ids 1,2,3, 7,8, 20 -> 3 islands, max len 3, max gap 11
        (1, 1, 0, 1), (2, 1, 10, 1), (3, 1, 20, 1),
        (7, 1, 30, 1), (8, 1, 40, 1), (20, 1, 50, 1),
        # user 2: single id -> 1 island, len 1, gap 0
        (100, 2, 0, 1),
    ]
    sf = _events(spark, rows, tmp_path)
    got = {r["user_id"]: (r["n_islands"], r["max_island"], r["max_gap"])
           for r in q_id_islands(spark, sf).collect()}
    assert got == {1: (3, 3, 11), 2: (1, 1, 0)}


def test_twa_hand_case(spark, tmp_path):
    # user 1: v=0 for 10us then v=10 for 10us (linear segments):
    # trapezoids: (10us)*(0+10)/2 + (10us)*(10+10)/2 = 50+100 => /20us = 7.5
    rows = [(1, 1, 0, 0), (2, 1, 10, 10), (3, 1, 20, 10),
            (9, 2, 0, 5)]                      # single event -> excluded
    sf = _events(spark, rows, tmp_path)
    got = {r["user_id"]: r["twa"] for r in q_twa_value(spark, sf).collect()}
    assert got == {1: 7.5}
