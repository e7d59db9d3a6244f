"""Synchronous label propagation (community detection).

Semantics: labels initialized to the vertex id; each superstep every
vertex adopts the most frequent label among its (undirected)
neighbors, ties broken by the minimum label — fully deterministic, so
results are reproducible across parallelism levels (north-rule
requirement). Stops at fixpoint (no label changed) or max_iter
(synchronous LPA can 2-cycle on bipartite structures; max_iter bounds
that).

Physical plan (round-4 revision). The symmetrized adjacency is
hash-partitioned + sorted by its SOURCE endpoint once and cached;
every superstep joins the (vertex-sized) label vector INTO that
layout — the edge frame never re-exchanges — and aggregates by the
OTHER endpoint, so the per-superstep wire is: label vector in, one
partially-aggregated (v, label) frequency exchange, one argmax
exchange. (The old shape re-exchanged + re-sorted the full 2E-row
frame every round.) Vertex ids are narrowed to int32 when they fit
(halves every shuffle byte); the changed-count rides the checkpoint's
lineage scan instead of a separate join job.

``mode="delta"`` — the frontier variant: after the first full vote,
each round recomputes votes ONLY for vertices adjacent to a vertex
whose label changed last round (the only votes that can move — their
neighbor-label multisets are the only ones that changed). Per-round
work and wire are proportional to the frontier's incident edge
volume, not E, and the result is IDENTICAL to sync mode at every
round (same vote, same tie-break). This is the LPA twin of
algos/cc.py's delta method and algos/paths.py's BFS frontier.

All label/argmax aggregation is JVM-side (max_by over a (cnt,
-label) struct — no window, no sort, no Python).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.algos.cc import _id_type
from adopt_spark.checkpoint import CheckpointManager


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    mode: str = "sync",
    num_partitions: int | None = None,
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
    ``mode="delta"`` recomputes only frontier-adjacent votes per
    round; its labels equal sync mode's at every round.
    """
    if mode not in ("sync", "semi", "delta"):
        raise ValueError(f"unknown mode: {mode}")
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    idt = _id_type(edges)
    e = edges.select(F.col("sid").cast(idt).alias("sid"),
                     F.col("tid").cast(idt).alias("tid")) \
             .where(F.col("sid") != F.col("tid"))
    # one cached layout serves every superstep of every mode: the
    # symmetrized deduped adjacency, hash-partitioned + sorted by v.
    # Per round the label vector joins INTO this layout (on v — no
    # exchange, no sort of the edge frame) and contributions aggregate
    # at the other endpoint.
    both = (
        e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
        .unionAll(e.select(F.col("tid").alias("v"), F.col("sid").alias("nbr")))
        .dropDuplicates(["v", "nbr"])
        .repartition(parts, "v")
        .sortWithinPartitions("v", "nbr")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vertices = both.select("v").distinct()

    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="lpa_ckpt_"))
    start_iter = 0
    frontier: DataFrame | None = None     # delta mode: changed vertices
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        snap = cm.load(spark, cm.latest())
        labels = snap.select("v", "label")
        if mode == "delta" and "changed" in snap.columns:
            frontier = snap.where(F.col("changed") == 1).select("v")
    else:
        labels = vertices.select("v", F.col("v").alias("label"))

    _argmax = F.max_by("label", F.struct(F.col("cnt"), (-F.col("label"))))

    def vote(cur: DataFrame, parity: int | None) -> DataFrame:
        """Majority label per vertex (min-label tie-break); parity
        restricts which vertices update, others keep their label.
        label(x) contributes to every neighbor of x, so the cached
        layout is joined on its v side and grouped by nbr."""
        contrib = both.join(cur, "v").select(F.col("nbr").alias("tv"),
                                             "label")
        if parity is not None:
            # pmod, not %: Spark's % returns negative remainders for
            # negative ids, which would match neither phase and freeze
            # those vertices forever
            contrib = contrib.where(F.pmod(F.col("tv"), F.lit(2)) == parity)
        freq = contrib.groupBy("tv", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        voted = (freq.groupBy("tv").agg(_argmax.alias("label"))
                 .withColumnRenamed("tv", "v"))
        if parity is None:
            return voted
        kept = cur.where(F.pmod(F.col("v"), F.lit(2)) != parity)
        return voted.unionByName(kept)

    def vote_frontier(cur: DataFrame, front: DataFrame) -> DataFrame:
        """Recompute votes only for vertices adjacent to the frontier;
        returns (v, label) for exactly that affected set."""
        affected = (both.join(front, "v", "leftsemi")
                    .select(F.col("nbr").alias("v")).distinct())
        eff = both.join(affected, "v", "leftsemi")        # no exchange
        contrib = (eff.join(cur.select(F.col("v").alias("nbr"),
                                       F.col("label")), "nbr")
                   .select("v", "label"))
        freq = contrib.groupBy("v", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        return freq.groupBy("v").agg(_argmax.alias("label"))

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        if mode == "semi":
            half = vote(labels, parity=1).localCheckpoint(eager=True)
            new_labels = vote(half, parity=0)
        elif mode == "delta" and frontier is not None:
            upd = vote_frontier(labels, frontier)
            new_labels = (labels.select("v", F.col("label").alias("_old"))
                          .join(upd.withColumnRenamed("label", "_new"),
                                "v", "left")
                          .select("v", F.coalesce("_new", "_old")
                                  .alias("label")))
        else:
            new_labels = vote(labels, parity=None)
        # one save materializes the superstep AND carries the changed
        # count on its lineage scan — no separate count job
        out = (labels.select("v", F.col("label").alias("_old"))
               .join(new_labels, "v")
               .select("v", "label",
                       (F.col("label") != F.col("_old"))
                       .cast("int").alias("changed")))
        out = cm.save(out, it, sum_cols=("changed",))
        changed = int(cm.metrics[-1]["sums"]["changed"])
        cm.amend_last(changed=changed)
        labels = out.select("v", "label")
        if mode == "delta":
            frontier = out.where(F.col("changed") == 1).select("v")
        metrics.append({"iteration": it, "changed": changed,
                        "sec": round(time.time() - t0, 4)})
        if changed == 0:
            break
    both.unpersist()
    return (labels.select(F.col("v").cast("long").alias("v"),
                          F.col("label").cast("long").alias("label")),
            metrics)


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
