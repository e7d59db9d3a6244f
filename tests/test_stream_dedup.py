"""Streaming dedup: duplicates arriving in LATER micro-batches must
be suppressed by carried state, not just within-batch distinct."""

from pyspark.sql import functions as F

from adopt_spark.streaming.dedup_stream import dedup_events_stream

SF = "/root/testdata/sf0.001"


def test_stream_dedup_collapses_replicas(spark):
    base = (spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
    exp = {(r["event_type"], r["n"]) for r in base.collect()}
    for copies in (2, 3):
        got = {(r["event_type"], r["n"])
               for r in dedup_events_stream(spark, SF, copies=copies).collect()}
        assert got == exp
