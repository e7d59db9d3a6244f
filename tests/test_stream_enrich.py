"""Stream-static enrichment join vs the equivalent batch join.

Two properties pinned:
  * completion equivalence — driven over the file source, the
    stream-static join + keyed agg equals the batch join + agg on the
    same rows (the production correctness contract);
  * plan shape — Spark plans the static dimension as the broadcast
    build side (stream-static equi-joins must not shuffle the stream
    for the lookup).
"""

from pyspark.sql import functions as F

from adopt_spark.streaming.enrich import stream_enrich_by_segment

SF = "/root/testdata/sf0.001"


def test_stream_enrich_matches_batch_join(spark):
    got_rows = stream_enrich_by_segment(spark, SF).collect()
    got = {(r["c_mktsegment"], r["event_type"], r["n"], r["total_value"])
           for r in got_rows}

    events = spark.read.parquet(f"{SF}/events.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    exp_rows = (
        events.join(customer, events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    ).collect()
    exp = {(r["c_mktsegment"], r["event_type"], r["n"], r["total_value"])
           for r in exp_rows}
    assert got == exp and len(got) > 0


def test_stream_enrich_broadcasts_dimension(spark):
    """The batch twin of the streamed plan must broadcast the
    dimension: BroadcastHashJoin, no SortMergeJoin / stream-side
    exchange for the join."""
    events = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_type", "value")
    customer = spark.read.parquet(f"{SF}/customer.parquet") \
        .select("c_custkey", "c_mktsegment")
    joined = events.join(customer,
                         F.col("user_id") == F.col("c_custkey"), "inner")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
