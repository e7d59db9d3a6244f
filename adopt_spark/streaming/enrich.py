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
