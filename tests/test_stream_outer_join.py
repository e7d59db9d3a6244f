"""Left-outer stream-stream join: watermark-expiry emission semantics.

Feeds two controlled micro-batches through a file source and checks
the completion result against the documented determinism contract:
matched pairs ≡ batch interval join; null-padded rows ≡ matchless
clicks whose join window closed strictly before the final global
watermark min(max_click_ts, max_purchase_ts) − delay.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

HOUR = 3600


def _write_events(spark, rows, path):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_outer(spark, src_dir, max_lag_minutes=60):
    schema = spark.read.parquet(src_dir).schema

    def side(evt, pfx):
        return (
            spark.readStream.schema(schema).parquet(src_dir)
            .where(F.col("event_type") == evt)
            .select(F.col("user_id").alias(f"{pfx}_user"),
                    F.col("ts").alias(f"{pfx}_ts"),
                    F.col("event_id").alias(f"{pfx}_id"))
            .withWatermark(f"{pfx}_ts", "1 hour")
        )

    joined = side("click", "c").join(
        side("purchase", "p"),
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")),
        "leftOuter",
    ).select("c_user", "c_id", "p_id")
    name = f"t_sso_{uuid.uuid4().hex[:8]}"
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {(r.c_id, r.p_id) for r in spark.table(name).collect()}


def test_outer_join_expiry_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    src = tempfile.mkdtemp(prefix="sso_test_")
    # click 1 @0h (user 7) matched by purchase 10 @0.5h (user 7)
    # click 2 @1h (user 7) matchless, window ends 2h
    # click 3 @9h (user 8) matchless, window ends 10h
    # click 12 @10h (user 9) matched by purchase 11 @11h (user 9,
    #   exactly at the +60 min inclusive bound)
    _write_events(spark, [
        (1, ts(0.0), 7, "click", 1.0, "{}"),
        (2, ts(1.0), 7, "click", 1.0, "{}"),
        (3, ts(9.0), 8, "click", 1.0, "{}"),
        (10, ts(0.5), 7, "purchase", 1.0, "{}"),
        (11, ts(11.0), 9, "purchase", 1.0, "{}"),
        (12, ts(10.0), 9, "click", 1.0, "{}"),
    ], src)
    out = _run_outer(spark, src)
    # final watermark = min(max_click 10h, max_purchase 11h) - 1h = 9h.
    # matched: (1,10) and the boundary pair (12,11). expired
    # (window end strictly < 9h): click 2 (ends 2h). click 3's window
    # ends 10h >= 9h -> still buffered, NOT emitted as null.
    assert out == {(1, 10), (12, 11), (2, None)}
