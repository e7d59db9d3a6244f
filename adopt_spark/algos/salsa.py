"""SALSA (Stochastic Approach for Link-Structure Analysis).

Lempel & Moran's degree-normalized HITS variant — the ranking behind
production who-to-follow / related-repo systems: random walks on the
bipartite hub/authority view,
  auth(v) = Σ over in-edges (u→v) of hub(u) / outdeg(u)
  hub(u)  = Σ over out-edges (u→v) of auth(v) / indeg(v)
each half-step L1-normalized (the transition is column-stochastic, so
normalization only pins floating-point drift and dangling loss — it
keeps the unrolled DuckDB oracle exact at 6 dp).

Spark plan per iteration (the pagerank.py/hits.py superstep shape):
the edge relation is decorated ONCE with 1/outdeg(src) and
1/indeg(dst), hash-partitioned by src and cached; each half-step is
one equi-join + groupBy-sum (map-side partial agg) plus one scalar
normalizer aggregate. Only the O(|V|) score vector shuffles per step;
snapshots flow through CheckpointManager for lineage truncation,
per-partition metrics, and resume — the north-rule iteration contract.

Reference parity: jxiw/ADOPT has no ranking surface; this extends the
link-graph tier alongside pagerank.py / hits.py / eigen.py.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 12,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v, auth, hub], metrics) after ``max_iter``
    full iterations; both score vectors sum to 1 (L1)."""
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    base = (edges.select(F.col("sid").cast("long").alias("src"),
                         F.col("tid").cast("long").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"]))
    outdeg = base.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = base.groupBy("dst").agg(F.count(F.lit(1)).alias("id_"))
    e = (base.join(outdeg, "src").join(indeg, "dst")
         .select("src", "dst",
                 (F.lit(1.0) / F.col("od")).alias("inv_od"),
                 (F.lit(1.0) / F.col("id_")).alias("inv_id"))
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
        return (spark.createDataFrame([], "v long, auth double, hub double"),
                [])
    rank_parts = max(1, min(parts, n // 100_000 + 1))

    cm = CheckpointManager(
        checkpoint_dir or tempfile.mkdtemp(prefix="salsa_ckpt_"))
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
            .agg(F.sum(F.col("hub") * F.col("inv_od")).alias("raw"))
        )
        a_norm = float(auth_raw.agg(F.sum("raw")).collect()[0][0] or 0.0)
        auth = vertices.join(auth_raw, "v", "left").select(
            "v", (F.coalesce(F.col("raw"), F.lit(0.0))
                  / F.lit(a_norm if a_norm else 1.0)).alias("auth")) \
            .localCheckpoint(eager=True)
        hub_raw = (
            e.join(auth.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum(F.col("auth") * F.col("inv_id")).alias("raw"))
        )
        h_norm = float(hub_raw.agg(F.sum("raw")).collect()[0][0] or 0.0)
        state = (
            auth.join(hub_raw, "v", "left")
            .select("v", "auth",
                    (F.coalesce(F.col("raw"), F.lit(0.0))
                     / F.lit(h_norm if h_norm else 1.0)).alias("hub"))
            .repartition(rank_parts, "v")
        )
        state = cm.save(state, it, phase="salsa")
        metrics.append({"iteration": it, "sec": round(time.time() - t0, 4)})

    e.unpersist()
    return state, metrics
