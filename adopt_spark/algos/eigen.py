"""Eigenvector centrality — power iteration with per-step L2
normalization on the symmetrized graph.

Completes the centrality suite next to PageRank (random-walk mass),
Katz (attenuated path counts), HITS (bipartite hub/authority) and
betweenness: the dominant-eigenvector score x ∝ A x, the limit Katz
approaches as α → 1/λ_max but without the β floor. The reference has
no centrality operators (its graph suite is motif counting,
graph_query/*.sql); this follows the same north-of-reference pattern
as algos/katz.py.

Plan per superstep (identical discipline to katz.py): one
edge ⋈ state join + neighbor-sum aggregate, one scalar L2-norm
aggregate broadcast back — the rank vector is the only thing that
shuffles; the edge table is hash-partitioned/sorted/cached once.
Checkpointed per superstep via CheckpointManager (resumable, lineage
truncated). Deterministic: fixed iteration count, 6 dp at the edge.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager

EIGEN_ITERS = 10


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = EIGEN_ITERS,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v, eigen], metrics): x0 = 1/sqrt(N) on the
    symmetrized simple graph, x_{t+1} = A x_t / ||A x_t||_2 for
    ``max_iter`` supersteps, scores rounded to 6 dp."""
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (edges.select(F.col("sid").cast("long").alias("u"),
                        F.col("tid").cast("long").alias("w"))
           .unionAll(edges.select(F.col("tid").cast("long").alias("u"),
                                  F.col("sid").cast("long").alias("w")))
           .where(F.col("u") != F.col("w"))
           .dropDuplicates(["u", "w"])
           .repartition(parts, "u")
           .sortWithinPartitions("u")
           .persist(StorageLevel.MEMORY_AND_DISK))
    sym.count()
    vertices = (sym.select(F.col("u").alias("v"))
                .distinct().localCheckpoint(eager=True))
    n = vertices.count()
    if n == 0:
        sym.unpersist()
        return spark.createDataFrame([], "v long, eigen double"), []
    rank_parts = max(1, min(parts, n // 100_000 + 1))

    cm = CheckpointManager(checkpoint_dir
                           or tempfile.mkdtemp(prefix="eigen_ckpt_"))
    start_iter = 0
    state = vertices.select("v", F.lit(1.0 / n ** 0.5).alias("x"))
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        state = cm.load(spark, cm.latest())

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        s = (sym.join(state.withColumnRenamed("v", "u"), "u")
             .groupBy(F.col("w").alias("v"))
             .agg(F.sum("x").alias("s")))
        # every vertex of the symmetrized graph has >= 1 neighbor, so
        # the neighbor-sum covers all of them; the norm is one scalar
        norm = s.agg(F.sqrt(F.sum(F.col("s") * F.col("s")))
                     .alias("nrm"))
        state = (s.crossJoin(F.broadcast(norm))
                 .select("v", (F.col("s") / F.col("nrm")).alias("x"))
                 .repartition(rank_parts, "v"))
        state = cm.save(state, it, phase="eigen")
        metrics.append({"iteration": it, "sec": round(time.time() - t0, 4)})

    sym.unpersist()
    return state.select("v", F.round("x", 6).alias("eigen")), metrics
