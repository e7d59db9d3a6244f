"""Streaming graph maintenance: incremental connected components over
an edge stream via foreachBatch.

Each micro-batch of edge insertions is folded into the running
component labelling with algos/cc.py:cc_incremental — the delta is
CONTRACTED onto the current labels and the star kernel runs on the
contracted graph, so per-batch merge work scales with the batch, not
the accumulated graph. Because every fold is exact (labels after the
fold equal a from-scratch recompute over all edges seen so far, with
min-id naming), the FINAL labelling is independent of how the stream
was batched or ordered — which is what makes an external batch oracle
possible for a streaming operator.

This is the streaming face of the north rule's link-graph engine: a
1000-executor deployment would point ``readStream`` at the edge-feed
directory/topic and checkpoint the labels table per batch (here they
are localCheckpointed; a real deployment writes them to the lakehouse
table the serving layer reads).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

CC_STREAM_BATCHES = 4


def streaming_cc_sizes(spark: SparkSession, edges: DataFrame,
                       n_batches: int = CC_STREAM_BATCHES) -> DataFrame:
    """Run ``edges`` through a file stream in ``n_batches``
    deterministic hash-split micro-batches ((sid+tid) % n), folding
    each into the running labels with cc_incremental; returns the
    final component-size table [component, size]."""
    from adopt_spark.algos.cc import cc_incremental

    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid")))
    src_dir = tempfile.mkdtemp(prefix="edge_stream_")
    stage = tempfile.mkdtemp(prefix="edge_stage_")
    for i in range(n_batches):
        part_dir = os.path.join(stage, f"b{i}")
        (e.where((F.col("sid") + F.col("tid")) % n_batches == i)
         .coalesce(1).write.mode("overwrite").parquet(part_dir))
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(src_dir, f"batch-{i}.parquet"))

    state: dict = {"labels": None, "batches": 0}
    empty_edges = spark.createDataFrame([], "sid long, tid long")

    def fold(batch_df, _bid):
        delta = batch_df.select("sid", "tid")
        labels, _ = cc_incremental(spark, empty_edges, delta,
                                   base_labels=state["labels"])
        state["labels"] = labels.localCheckpoint(eager=True)
        state["batches"] += 1

    stream = (spark.readStream.schema("sid long, tid long")
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (stream.writeStream.foreachBatch(fold)
         .queryName(f"cc_{uuid.uuid4().hex[:8]}")
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="cc_stream_ckpt_"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    labels = state["labels"]
    if labels is None:
        return spark.createDataFrame([], "component long, size long")
    return (labels.groupBy("component")
            .agg(F.count(F.lit(1)).alias("size")))


def streaming_cc_resumable(spark: SparkSession, src_dir: str,
                           ckpt_dir: str, labels_dir: str,
                           files: list[str] | None = None) -> DataFrame:
    """Restart-safe variant: source offsets live in Spark's OWN
    streaming checkpoint (``ckpt_dir``) and the labels table is
    persisted to ``labels_dir`` parquet after every fold, so a stopped
    query resumes EXACTLY where the offset log says — already-consumed
    files are not refolded, new files are. Call once per "process what
    is currently available" run (Trigger.AvailableNow semantics via
    processAllAvailable); drop more files into ``src_dir`` and call
    again with the same dirs to continue the same logical query.

    ``files``: optional list of parquet files to copy into ``src_dir``
    before this run (the test harness's way of simulating arrivals).
    Returns the current labels table.
    """
    import glob as _glob
    import shutil as _shutil

    from adopt_spark.algos.cc import cc_incremental

    os.makedirs(src_dir, exist_ok=True)
    for f in files or []:
        _shutil.copy(f, src_dir)

    empty_edges = spark.createDataFrame([], "sid long, tid long")

    def load_labels():
        if _glob.glob(os.path.join(labels_dir, "*.parquet")):
            return spark.read.parquet(labels_dir)
        return None

    def fold(batch_df, _bid):
        delta = batch_df.select("sid", "tid")
        labels, _ = cc_incremental(spark, empty_edges, delta,
                                   base_labels=load_labels())
        # overwrite-then-publish: the fold is idempotent on replay
        # (cc_incremental of the same delta onto the same base yields
        # the same labels), which is what makes foreachBatch + offset
        # checkpoint exactly-once at the TABLE level
        tmp = labels_dir + ".tmp"
        labels.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(labels_dir):
            _shutil.rmtree(labels_dir)
        os.rename(tmp, labels_dir)

    stream = (spark.readStream.schema("sid long, tid long")
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", ckpt_dir)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = load_labels()
    if out is None:
        return spark.createDataFrame([], "v long, component long")
    return out
