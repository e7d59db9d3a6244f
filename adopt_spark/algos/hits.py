"""HITS (hubs & authorities): the companion link-analysis ranking.

Kleinberg's algorithm on the directed edge relation: per iteration
  auth(v) = Σ over in-edges (u→v) of hub(u),  then L1-normalize;
  hub(v)  = Σ over out-edges (v→u) of auth(u), then L1-normalize.
L1 normalization (scores sum to 1) keeps the recurrence exactly
expressible in the unrolled DuckDB oracle — no square roots.

Spark plan per iteration (mirrors pagerank.py's superstep shape):
the edge relation is hash-partitioned by src and cached once; each
half-step is one join + groupBy-sum (map-side partial agg) over it,
plus one scalar aggregate for the normalizer. The (v, auth, hub)
vector snapshots through CheckpointManager per iteration — lineage
truncation, per-partition metrics, and resumability come with it.

The reference is a motif-count engine with no ranking operators; this
is north-rule link-graph surface alongside PageRank (pagerank.py).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager


def hits(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 12,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v, auth, hub], metrics) after ``max_iter``
    full iterations; both score vectors sum to 1 (L1)."""
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

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
        return spark.createDataFrame([], "v long, auth double, hub double"), []
    rank_parts = max(1, min(parts, n // 100_000 + 1))

    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="hits_ckpt_"))
    start_iter = 0
    state = vertices.select(
        "v", F.lit(1.0 / n).alias("auth"), F.lit(1.0 / n).alias("hub"))
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        state = cm.load(spark, cm.latest())

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        hubs = state.select("v", "hub")
        auth_raw = (
            e.join(hubs.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("hub").alias("raw"))
        )
        a_norm = float(auth_raw.agg(F.sum("raw")).collect()[0][0] or 0.0)
        # materialize once: the normalized vector feeds both the hub
        # join and the final select (avoids re-running the auth join)
        auth = vertices.join(auth_raw, "v", "left").select(
            "v", (F.coalesce(F.col("raw"), F.lit(0.0))
                  / F.lit(a_norm if a_norm else 1.0)).alias("auth")) \
            .localCheckpoint(eager=True)
        hub_raw = (
            e.join(auth.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("auth").alias("raw"))
        )
        h_norm = float(hub_raw.agg(F.sum("raw")).collect()[0][0] or 0.0)
        state = (
            auth.join(hub_raw, "v", "left")
            .select("v", "auth",
                    (F.coalesce(F.col("raw"), F.lit(0.0))
                     / F.lit(h_norm if h_norm else 1.0)).alias("hub"))
            .repartition(rank_parts, "v")
        )
        state = cm.save(state, it, phase="hits")
        metrics.append({"iteration": it, "sec": round(time.time() - t0, 4)})

    e.unpersist()
    return state, metrics
