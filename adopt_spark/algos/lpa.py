"""Synchronous label propagation (community detection).

Semantics: labels initialized to the vertex id; each superstep every
vertex adopts the most frequent label among its (undirected)
neighbors, ties broken by the minimum label — fully deterministic, so
results are reproducible across parallelism levels (north-rule
requirement). Stops at fixpoint (no label changed) or max_iter
(synchronous LPA can 2-cycle on bipartite structures; max_iter bounds
that).

Plan per superstep: one join (neighbor labels), one two-key partial
aggregation (label frequencies), one max_by aggregation (argmax with
tie-break packed into a struct — no window, no sort). All JVM-side.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.checkpoint import CheckpointManager


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame[v: long, label: long], metrics)."""
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    both = (
        e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
        .unionAll(e.select(F.col("tid").alias("v"), F.col("sid").alias("nbr")))
        .dropDuplicates(["v", "nbr"])
        .localCheckpoint(eager=True)
    )
    vertices = both.select("v").distinct()

    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="lpa_ckpt_"))
    start_iter = 0
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        labels = cm.load(spark, cm.latest())
    else:
        labels = vertices.select("v", F.col("v").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        nbr_labels = both.join(
            labels.select(F.col("v").alias("nbr"), F.col("label")), "nbr"
        ).select("v", "label")
        freq = nbr_labels.groupBy("v", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # argmax(cnt) with min-label tie-break: max_by over (cnt, -label)
        new_labels = freq.groupBy("v").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")))).alias("label")
        )
        # save FIRST (materializes the superstep plan exactly once and
        # truncates lineage), then count changes against the parquet-
        # backed output — same pattern as pagerank.py's save-then-agg.
        new_labels = cm.save(new_labels, it)
        changed = int(
            new_labels.join(labels.withColumnRenamed("label", "old"), "v")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        cm.amend_last(changed=changed)
        labels = new_labels
        metrics.append({"iteration": it, "changed": changed,
                        "sec": round(time.time() - t0, 4)})
        if changed == 0:
            break
    return labels, metrics
