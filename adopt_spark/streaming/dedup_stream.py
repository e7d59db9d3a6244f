"""Streaming exactly-once deduplication (cross-micro-batch state).

The third leg of the streaming surface next to windowed.py
(event-time aggregation) and enrich.py (stream-static join):
``dropDuplicates`` over an unbounded stream, i.e. at-least-once
ingestion upgraded to exactly-once semantics by keyed dedup state.

The test/oracle harness feeds the SAME events file through the source
twice (two symlinks, ``maxFilesPerTrigger=1``), so micro-batch 2 is a
100% duplicate of micro-batch 1 — every surviving row proves the
dedup state carried across batches. Driven to completion, the
deduplicated stream must collapse back to the original table; the
DuckDB oracle is plain batch ``GROUP BY`` over the single copy.

Scale note: unbounded ``dropDuplicates`` keeps one state row per key
forever. Production streams bound that with
``dropDuplicatesWithinWatermark`` (state evicted once the watermark
passes the key's event time); we use the unbounded form here because
the finite file source terminates, and the bounded variant is the
same plan plus a watermark column.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def dedup_events_stream(spark: SparkSession, sf_dir: str,
                        copies: int = 2) -> DataFrame:
    """Stream `copies` replicas of the events table through
    dropDuplicates(event_id), one file per micro-batch; return the
    per-type counts of the surviving rows as a batch DataFrame
    [event_type, n]."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_dedup_")
    for i in range(copies):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(src_dir, f"events-{i}.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("event_id", "event_type")
        .dropDuplicates(["event_id"])
    )
    name = f"dd_{uuid.uuid4().hex[:8]}"
    # append mode: each key's first occurrence is emitted exactly once
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
