"""Vertex dictionary: repo name → dense long id.

The reference dictionary-encodes every string column to dense int
codes so its join hot path is integer-only
(compression/Compressor.java:26-49, data/Dictionary.java). Same move
here: graph algorithms run on longs; the dictionary maps back for
presentation.

Determinism & scale: ids are the rank of the repo name in sorted
order. Assignment is fully DataFrame-native, two passes and no
global single-partition window: range-partition + sort by name, count
rows per partition, turn the (tiny, one-row-per-partition) counts into
cumulative offsets, then vid = offset(partition) + row_number within
the partition — each window partition is exactly one data partition,
so no task ever sees more than its own slice. Deterministic for a
fixed input set at any parallelism. No RDD / per-row Python anywhere
(input-hint contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_vertex_dictionary(names: DataFrame, col: str = "repo") -> DataFrame:
    """DataFrame[name: string, vid: long], vid = rank in sorted order."""
    spark = names.sparkSession
    parts = spark.sparkContext.defaultParallelism
    # materialize the partitioned+sorted layout once so the counts pass
    # and the numbering pass see identical partitions (range
    # partitioning samples its bounds; don't recompute it twice)
    d = (
        names.select(F.col(col).alias("name")).distinct()
        .repartitionByRange(parts, "name")
        .sortWithinPartitions("name")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"))
    w_rank = Window.partitionBy("pid").orderBy("name")
    return (
        d.join(F.broadcast(offsets), "pid")
        .select("name",
                (F.col("off") + F.row_number().over(w_rank) - 1)
                .cast("long").alias("vid"))
    )


def encode_edges(edges: DataFrame, vocab: DataFrame,
                 src: str = "src_repo", dst: str = "dst_repo") -> DataFrame:
    """String edges → long edges [sid, tid] via two broadcast joins.

    The dictionary is #repos-sized (≪ #edges), so broadcasting it is
    the shuffle-free path at cluster scale.
    """
    v_src = vocab.select(F.col("name").alias(src), F.col("vid").alias("sid"))
    v_dst = vocab.select(F.col("name").alias(dst), F.col("vid").alias("tid"))
    return (
        edges.join(F.broadcast(v_src), src)
        .join(F.broadcast(v_dst), dst)
        .select("sid", "tid")
    )
