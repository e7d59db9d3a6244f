"""Vertex dictionary: repo name → dense long id.

The reference dictionary-encodes every string column to dense int
codes so its join hot path is integer-only
(compression/Compressor.java:26-49, data/Dictionary.java). Same move
here: graph algorithms run on longs; the dictionary maps back for
presentation.

Determinism & scale: ids are the rank of the repo name in sorted
order. Assignment uses sortWithinPartitions over a range partitioning
plus per-partition offsets (zipWithIndex), i.e. two passes and no
global single-partition window — the standard scalable dense-id
build. Deterministic for a fixed input set at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def build_vertex_dictionary(names: DataFrame, col: str = "repo") -> DataFrame:
    """DataFrame[name: string, vid: long], vid = rank in sorted order."""
    distinct = names.select(F.col(col).alias("name")).distinct()
    rdd = (
        distinct.repartitionByRange(distinct.sparkSession.sparkContext.defaultParallelism, "name")
        .sortWithinPartitions("name")
        .rdd.map(lambda r: r["name"])
        .zipWithIndex()
    )
    schema = StructType([
        StructField("name", StringType(), False),
        StructField("vid", LongType(), False),
    ])
    return distinct.sparkSession.createDataFrame(rdd, schema)


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
