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
    mode: str = "sync",
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame[v: long, label: long], metrics).

    ``mode="sync"`` (default) is classic synchronous LPA — fully
    deterministic but can 2-cycle on bipartite structures (bounded by
    max_iter; the round-1 documented behavior). ``mode="semi"`` is
    semi-synchronous LPA: each superstep updates odd-id vertices
    first (even labels fixed), then even-id vertices against the
    refreshed labels — still deterministic at any parallelism, and
    the two-phase schedule breaks bipartite oscillation so fixpoint
    is reached (the classic graph-coloring-schedule fix).
    """
    if mode not in ("sync", "semi"):
        raise ValueError(f"unknown mode: {mode}")
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

    def vote(cur: DataFrame, parity: int | None) -> DataFrame:
        """Majority label per vertex (min-label tie-break); parity
        restricts which vertices update, others keep their label."""
        nbr_labels = both.join(
            cur.select(F.col("v").alias("nbr"), F.col("label")), "nbr"
        ).select("v", "label")
        if parity is not None:
            # pmod, not %: Spark's % returns negative remainders for
            # negative ids, which would match neither phase and freeze
            # those vertices forever
            nbr_labels = nbr_labels.where(F.pmod(F.col("v"), F.lit(2)) == parity)
        freq = nbr_labels.groupBy("v", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        # argmax(cnt) with min-label tie-break: max_by over (cnt, -label)
        voted = freq.groupBy("v").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label"))))
            .alias("label")
        )
        if parity is None:
            return voted
        kept = cur.where(F.pmod(F.col("v"), F.lit(2)) != parity)
        return voted.unionByName(kept)

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        if mode == "semi":
            half = vote(labels, parity=1).localCheckpoint(eager=True)
            new_labels = vote(half, parity=0)
        else:
            new_labels = vote(labels, parity=None)
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


def directed_modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Leicht-Newman directed modularity of a community assignment ->
    one row (n_edges, n_communities, modularity at 6 dp):

      Q = within/m  -  sum_c (dout_c * din_c) / m^2

    with m = distinct non-loop directed edges, within = edges whose
    endpoints share a label, dout_c/din_c = community out-/in-degree
    sums. All inputs are exact BIGINTs; the two final divisions are
    the only floats, so the 6 dp result is engine-order-independent.

    Scale shape: two label equi-joins onto the edge list (AQE handles
    hub communities), two degree aggregations, one per-label roll-up —
    the standard community-evaluation plan after LPA/CC.
    """
    e = (edges.select(F.col("sid").cast("long").alias("sid"),
                      F.col("tid").cast("long").alias("tid"))
         .where(F.col("sid") != F.col("tid"))
         .dropDuplicates(["sid", "tid"]))
    lab = labels.select(F.col("v").cast("long").alias("v"), "label")
    m = e.agg(F.count(F.lit(1)).alias("m"))
    within = (e.join(lab.withColumnRenamed("v", "sid")
                     .withColumnRenamed("label", "_la"), "sid")
              .join(lab.withColumnRenamed("v", "tid")
                    .withColumnRenamed("label", "_lb"), "tid")
              .where(F.col("_la") == F.col("_lb"))
              .agg(F.count(F.lit(1)).alias("within")))
    outd = e.groupBy("sid").agg(F.count(F.lit(1)).alias("k")) \
            .withColumnRenamed("sid", "v")
    ind = e.groupBy("tid").agg(F.count(F.lit(1)).alias("k")) \
           .withColumnRenamed("tid", "v")
    comm = (lab.join(outd, "v", "left").withColumnRenamed("k", "dout")
            .join(ind, "v", "left").withColumnRenamed("k", "din")
            .groupBy("label")
            .agg(F.coalesce(F.sum("dout"), F.lit(0)).alias("dout"),
                 F.coalesce(F.sum("din"), F.lit(0)).alias("din")))
    null_model = comm.agg(
        F.sum(F.col("dout") * F.col("din")).alias("dd"),
        F.count(F.lit(1)).alias("n_communities"))
    return (m.crossJoin(within).crossJoin(null_model)
            .select(F.col("m").alias("n_edges"),
                    "n_communities",
                    F.round(F.col("within") / F.col("m").cast("double")
                            - F.col("dd")
                            / (F.col("m") * F.col("m")).cast("double"),
                            6).alias("modularity")))
