"""k-core decomposition by iterative peeling.

North-of-reference graph surface (the reference counts motifs only):
the k-core of an undirected graph is the maximal subgraph where every
vertex has degree ≥ k. ``k_core`` peels one k; ``core_numbers``
computes the full decomposition by peeling k = 1, 2, ... until the
graph empties — O(k_max) peel rounds, each round a degree-groupBy +
semi-join, both partial-aggregated shuffles.

Deterministic, parallelism-independent. Checkpoints each peel round
through the standard manager (lineage truncation).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.checkpoint import CheckpointManager


def _sym(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
    rev = edges.select(F.col("tid").alias("u"), F.col("sid").alias("v"))
    return fwd.unionAll(rev).where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def k_core(spark: SparkSession, edges: DataFrame, k: int,
           max_iter: int = 100) -> DataFrame:
    """Vertices of the k-core: DataFrame[v: long]."""
    e = _sym(edges).localCheckpoint(eager=True)
    cm = CheckpointManager(tempfile.mkdtemp(prefix="kcore_"))
    it = 0
    while it < max_iter:
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("u")
        new_e = (
            e.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
        )
        new_e = cm.save(new_e, it)
        n_old, n_new = e.count(), new_e.count()
        e = new_e
        it += 1
        if n_new == n_old or n_new == 0:
            break
    return e.select(F.col("u").alias("v")).distinct()


def core_numbers(spark: SparkSession, edges: DataFrame,
                 max_k: int = 64) -> DataFrame:
    """Core number per vertex: DataFrame[v: long, core: int].

    Peels k = 1..max_k; a vertex's core number is the largest k whose
    k-core contains it. Vertices only in the input via self-loops get
    core 0 (they're dropped with the loops).
    """
    sym = _sym(edges).persist()
    vertices = sym.select(F.col("u").alias("v")).distinct()
    result = vertices.select("v", F.lit(0).alias("core"))
    for k in range(1, max_k + 1):
        members = k_core(spark, edges, k)
        if members.isEmpty():
            break
        result = (
            result.join(members.withColumn("in_core", F.lit(True)), "v", "left")
            .select("v", F.when(F.col("in_core"), F.lit(k))
                    .otherwise(F.col("core")).alias("core"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return result
