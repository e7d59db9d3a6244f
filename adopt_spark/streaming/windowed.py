"""Windowed streaming aggregation over the events table.

The reference engine has no streaming at all (SURVEY.md §2.9); the
north-rule engine adds the canonical Structured Streaming pattern:
file source → event-time tumbling window + watermark → memory sink,
driven to completion synchronously for test/oracle parity (the result
at completion must equal the equivalent batch SQL — that equivalence
IS the correctness check).

At scale the same plan runs on a real stream (kafka source, parquet
sink) unchanged — that is the point of declaring it as a streaming
DataFrame rather than a batch loop.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str,
                               watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window counts per event_type, via readStream.

    Returns the completed result as a batch DataFrame
    [window_start: string, event_type, n, total_value].
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # Spark's file-stream source requires a directory; the testdata table
    # is a single file, so expose it through a symlinked temp dir (a real
    # deployment would read a directory/kafka topic to begin with).
    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        # parquet stores TIMESTAMP_NTZ; watermarks need session-tz timestamps
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    name = f"evt_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n", "total_value",
    )


def windowed_counts_append_stream(spark: SparkSession, source_dir: str,
                                  window: str = "1 hour",
                                  watermark: str = "30 minutes",
                                  max_files_per_trigger: int | None = 1
                                  ) -> DataFrame:
    """Append-mode tumbling-window counts with REAL watermark
    semantics: a window row is emitted exactly once, only after the
    watermark passes its end, and events arriving later than the
    watermark are dropped — the production late-data contract
    (complete mode above keeps all state and re-emits, which is the
    batch-equivalence shape, not the bounded-state shape).

    ``source_dir``: directory of parquet files; with
    ``max_files_per_trigger=1`` each file is one micro-batch in mtime
    order, so tests can stage late arrivals across batches.
    Returns the completed result [window_start: string, event_type,
    n: long].
    """
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"evta_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "event_type", "n",
    )


def sliding_event_counts_stream(spark: SparkSession, sf_dir: str,
                                window: str = "2 hours",
                                slide: str = "1 hour",
                                watermark: str = "1 hour") -> DataFrame:
    """OVERLAPPING (sliding) windows — each event lands in
    window/slide windows; state is per (window, key) exactly like the
    tumbling case, ×(window/slide) entries. Complete mode over the
    file source for batch-oracle parity (the oracle unions one copy
    of each event per slide offset).

    Returns the completed result as a batch DataFrame
    [window_start: string, event_type, n, total_value].
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_slide_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    name = f"evs_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return out.select(
        F.date_format(F.col("w.start"),
                      "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n", "total_value",
    )


def session_window_stream(spark: SparkSession, sf_dir: str,
                          gap: str = "30 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Spark's NATIVE session windows (F.session_window) — the
    built-in counterpart of stateful.py's custom
    applyInPandasWithState sessionizer: per-key gap-merged windows
    where window end = last event + gap. Complete mode over the file
    source for batch-oracle parity (the oracle is lag+cumsum gap
    sessionization with the same gap, end = max(ts) + gap).

    Returns [event_type, session_start: string, session_end: string,
    n].
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_sesswin_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"sw_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        "event_type",
        F.date_format(F.col("w.start"),
                      "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.col("w.end"),
                      "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n",
    )


def windowed_topk_stream(spark: SparkSession, sf_dir: str, k: int = 3,
                         watermark: str = "1 hour") -> DataFrame:
    """Hourly top-k users by event count: the streaming side runs the
    tumbling-window (window, user) count aggregation — the heavy,
    incremental part — and the rank runs as a batch window over the
    materialized aggregate (ranking is not a supported streaming op;
    aggregate-in-stream / rank-at-serve is the production split, with
    the sink table per-window-partitioned so the serve rank never
    re-reads history).

    Returns [window_start: string, user_id, n, rank], rank ≤ k,
    deterministic tie-break (count desc, user_id asc).
    """
    from pyspark.sql import Window

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="events_topk_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"topk_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    agg = spark.table(name).select(
        F.date_format(F.col("w.start"),
                      "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "user_id", "n")
    rw = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("user_id"))
    return (agg.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= k))
