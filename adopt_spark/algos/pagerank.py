"""PageRank: power iteration, damping 0.85, L1 convergence ≤ 1e-6.

Semantics (north rule): per-vertex scores summing to 1, dangling-node
mass redistributed uniformly, iterate until the L1 delta between
successive rank vectors is ≤ tol.

Spark plan per superstep (all declarative, no Python in the hot path):
  * ``links`` = edges + 1/outdeg, hash-partitioned by src and cached
    ONCE — every iteration's join reuses the cached partitioning, so
    only the (small) rank vector shuffles per superstep.
  * contributions: join links⋈ranks on src → groupBy(dst).sum —
    Spark's partial aggregation is the map-side combine; optional
    explicit hub salting via skew.salted_contributions.
  * dangling mass: ranks of vertices with no out-edges (precomputed
    anti-join set), one scalar aggregate.
  * new rank = (1-d)/N + d·(contrib + dangling/N), for every vertex
    (left join + coalesce 0 keeps rank-less vertices alive).
  * L1 delta via join of old/new vectors.

Checkpointing: each superstep snapshots the rank vector through
CheckpointManager (parquet + per-partition lineage + metrics);
``resume=True`` restarts from the latest snapshot — the engine-level
analogue of the reference's anytime frontier resume
(HyperCubeEvaluationTask.java:283-341).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager
from adopt_spark.skew import salted_contributions


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    hub_threshold: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (ranks DataFrame[v: long, rank: double], metrics list)."""
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col("sid").cast("long").alias("src"),
                     F.col("tid").cast("long").alias("dst")) \
             .dropDuplicates(["src", "dst"])
    vertices = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(parts, "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_vertices = vertices.count()
    if n_vertices == 0:
        empty = spark.createDataFrame([], "v long, rank double")
        return empty, []

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    links = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_deg"))
        .repartition(parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = links.count()
    dangling = vertices.join(outdeg.withColumnRenamed("src", "v"), "v", "left_anti") \
                       .persist(StorageLevel.MEMORY_AND_DISK)
    dangling.count()

    cm = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_iter = 0
    ranks: DataFrame
    if cm and resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        ranks = cm.load(spark, cm.latest()).repartition(parts, "v")
    else:
        ranks = vertices.select("v", F.lit(1.0 / n_vertices).alias("rank"))

    metrics: list[dict] = []
    base = (1.0 - damping) / n_vertices
    for it in range(start_iter, max_iter):
        t0 = time.time()
        if hub_threshold:
            contribs = salted_contributions(links, ranks, hub_threshold)
        else:
            contribs = (
                links.join(ranks.withColumnRenamed("v", "src"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("contrib"))
            )
        d_mass_row = dangling.join(ranks, "v").agg(F.sum("rank")).collect()[0][0]
        d_mass = float(d_mass_row or 0.0)
        new_ranks = (
            vertices.join(contribs.withColumnRenamed("dst", "v"), "v", "left")
            .select(
                "v",
                (F.lit(base)
                 + F.lit(damping) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                     + F.lit(d_mass / n_vertices))).alias("rank"),
            )
        )
        delta = float(
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "v")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        sec = time.time() - t0
        rec = {
            "iteration": it,
            "l1_delta": delta,
            "sec": round(sec, 4),
            "edges": n_edges,
            "edges_per_sec": round(n_edges / sec, 2),
        }
        if cm:
            extra = {k: v for k, v in rec.items() if k != "iteration"}
            new_ranks = cm.save(new_ranks.repartition(parts, "v"), it, **extra)
        else:
            new_ranks = new_ranks.repartition(parts, "v").localCheckpoint(eager=True)
        ranks = new_ranks
        metrics.append(rec)
        if delta <= tol:
            break
    return ranks, metrics
