"""Katz centrality: attenuated path-count link ranking.

Fixed-iteration recurrence over the directed edge relation
    x_{t+1}(v) = beta + alpha * sum over in-edges (u -> v) of x_t(u)
with x_0 = beta everywhere (beta = 1). At convergence (alpha below
1/lambda_max) x counts all in-paths attenuated by alpha^length; run
to a FIXED iteration budget the partial sums are deterministic and
exactly reproducible by an unrolled SQL recurrence, which is what the
contract checks (same discipline as pagerank_fixed / hits).

Spark plan per iteration (same superstep shape as pagerank.py /
hits.py): edges hash-partitioned by src and cached once; one
join + groupBy-sum with map-side partial agg; the vertex-sized score
vector snapshots through CheckpointManager (lineage truncation,
per-partition metrics, resumability). Only the O(V) vector moves per
superstep — the edge table never reshuffles.

The reference is a motif-count engine with no ranking operators; this
is north-rule link-graph surface alongside PageRank and HITS.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.01,
    beta: float = 1.0,
    max_iter: int = 8,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v, katz], metrics) after ``max_iter``
    supersteps, scores rounded to 6 dp."""
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"])
         .repartition(parts, "src")
         .sortWithinPartitions("src")
         .persist(StorageLevel.MEMORY_AND_DISK))
    e.count()
    vertices = (e.select(F.col("src").alias("v"))
                .unionAll(e.select(F.col("dst").alias("v")))
                .distinct().localCheckpoint(eager=True))
    n = vertices.count()
    if n == 0:
        e.unpersist()
        return spark.createDataFrame([], "v long, katz double"), []
    rank_parts = max(1, min(parts, n // 100_000 + 1))

    cm = CheckpointManager(checkpoint_dir
                           or tempfile.mkdtemp(prefix="katz_ckpt_"))
    start_iter = 0
    state = vertices.select("v", F.lit(float(beta)).alias("x"))
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        state = cm.load(spark, cm.latest())

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        contrib = (
            e.join(state.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("x").alias("s"))
        )
        state = (vertices.join(contrib, "v", "left")
                 .select("v", (F.lit(float(beta))
                               + F.lit(float(alpha))
                               * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("x"))
                 .repartition(rank_parts, "v"))
        state = cm.save(state, it, phase="katz")
        metrics.append({"iteration": it, "sec": round(time.time() - t0, 4)})

    e.unpersist()
    return state.select("v", F.round("x", 6).alias("katz")), metrics
