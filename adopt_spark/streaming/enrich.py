"""Stream-static enrichment join — the canonical streaming lookup.

The reference engine has no streaming (SURVEY.md §2.9 maps it as
north-of-reference); this module adds the other half of the
Structured Streaming surface next to windowed.py's event-time
aggregations: a *stream-static join*, i.e. enriching an unbounded
event stream with a bounded dimension table.

Physical shape (the one that matters at 100 TB):

  * the static side is read ONCE per micro-batch planning cycle and
    broadcast — Spark plans a stream-static equi-join as a
    BroadcastHashJoin with the static side as the build relation, so
    the stream side never shuffles for the join;
  * the post-join aggregation is the only stateful operator, keyed by
    the (low-cardinality) dimension attributes — state is O(groups),
    not O(events).

Driven to completion synchronously on a file source for test/oracle
parity: at completion the result must equal the equivalent batch SQL
join — that equivalence IS the correctness check, exactly as for
windowed.py.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_enrich_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich the events stream with the customer dimension and
    aggregate per (market segment, event type).

    events.user_id keys directly into customer.c_custkey (the driver
    generates user ids from the customer key space). The customer
    side stays a plain batch DataFrame — Spark broadcasts it under
    the stream-static join rule; only (c_custkey, c_mktsegment)
    survive column pruning into the build side.

    Returns the completed result as a batch DataFrame
    [c_mktsegment, event_type, n, total_value].
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # File-stream sources need a directory; the testdata table is one
    # file, so expose it through a symlinked temp dir (windowed.py
    # does the same; a real deployment reads a topic/directory).
    src_dir = tempfile.mkdtemp(prefix="events_enrich_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))
    customer = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
    )
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        .select("user_id", "event_type", "value")
        .join(customer, F.col("user_id") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    name = f"enr_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_stream_click_purchase(spark: SparkSession, sf_dir: str,
                                 max_lag_minutes: int = 60) -> DataFrame:
    """STREAM-STREAM interval join — the fourth Structured Streaming
    join shape next to stream-static enrich: clicks and purchases
    arrive on two unbounded streams; emit (user, click-ts, purchase-
    ts) pairs where the purchase follows the click within
    ``max_lag_minutes`` (the classic attribution join).

    Both sides carry watermarks and the join predicate bounds
    purchase_ts to [click_ts, click_ts + lag], so Spark can size the
    state store: each side buffers only rows younger than watermark +
    lag — bounded state, the production contract. Append mode (the
    only mode stream-stream joins support); driven to completion the
    emitted set must equal the batch interval join, which is the
    DuckDB oracle.

    Returns the aggregated completion result [user_id, n_pairs,
    min_lag_s, max_lag_s] (one row per user with ≥1 attributed pair)
    — the aggregation keeps the contract output stable and small
    while the join itself is row-level.
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_ss_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))

    def side(evt: str, pfx: str):
        return (
            spark.readStream.schema(schema).parquet(src_dir)
            .where(F.col("event_type") == evt)
            .select(F.col("user_id").alias(f"{pfx}_user"),
                    F.col("ts").cast("timestamp").alias(f"{pfx}_ts"),
                    F.col("event_id").alias(f"{pfx}_id"))
            .withWatermark(f"{pfx}_ts", "1 hour")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    lag = F.col("p_ts").cast("long") - F.col("c_ts").cast("long")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")),
        "inner",
    ).select(F.col("c_user").alias("user_id"), lag.alias("lag_s"))
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.min("lag_s").alias("min_lag_s"),
                 F.max("lag_s").alias("max_lag_s")))


def stream_stream_click_purchase_outer(spark: SparkSession, sf_dir: str,
                                       max_lag_minutes: int = 60) -> DataFrame:
    """LEFT-OUTER stream-stream interval join — the state-eviction
    semantics the inner variant never exercises: a click with no
    purchase in its window is emitted with nulls only once the global
    watermark has passed the end of its join window (so the engine
    can prove no future purchase can match). This is the fifth
    Structured Streaming join shape in the module and the one whose
    correctness depends on watermark-driven state cleanup (Spark runs
    no-data micro-batches to flush evicted state; the finite-source
    completion result is therefore deterministic).

    Determinism contract mirrored by the oracle: the global watermark
    after the final batch is min(max click ts, max purchase ts) − the
    1 h watermark delay; a matchless click is emitted iff its join
    window [c_ts, c_ts + lag] closes strictly before that watermark.
    Matched pairs are emitted exactly as in the inner join.

    Returns [user_id, n_matched, n_expired] per user with any
    emitted row — n_expired counts the null-padded (timed-out)
    clicks, the rows an inner join silently drops.
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_sso_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))

    def side(evt: str, pfx: str):
        return (
            spark.readStream.schema(schema).parquet(src_dir)
            .where(F.col("event_type") == evt)
            .select(F.col("user_id").alias(f"{pfx}_user"),
                    F.col("ts").cast("timestamp").alias(f"{pfx}_ts"),
                    F.col("event_id").alias(f"{pfx}_id"))
            .withWatermark(f"{pfx}_ts", "1 hour")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")),
        "leftOuter",
    ).select(F.col("c_user").alias("user_id"), F.col("c_id"),
             F.col("p_id"))
    name = f"sso_{uuid.uuid4().hex[:8]}"
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .groupBy("user_id")
            .agg(F.count("p_id").alias("n_matched"),
                 F.sum(F.when(F.col("p_id").isNull(), 1).otherwise(0))
                  .alias("n_expired")))
