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
    (left join + coalesce 0 keeps rank-less vertices alive). The same
    pass also emits |new-old| and the dangling-rank term as columns
    (old ranks join on the shared hash(v) partitioning), so the
    convergence check is a plain 2-column scan of the checkpoint —
    one heavy job + one trivial job per superstep, no second join
    pass over the vector.

Checkpointing: each superstep snapshots the rank vector through
CheckpointManager (parquet + per-partition lineage + metrics);
``resume=True`` restarts from the latest snapshot — the engine-level
analogue of the reference's anytime frontier resume
(HyperCubeEvaluationTask.java:283-341).
"""

from __future__ import annotations

import tempfile
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
    reset_vertices: list[int] | None = None,
    weight_col: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (ranks DataFrame[v: long, rank: double], metrics list).

    ``reset_vertices`` switches to personalized PageRank: the teleport
    distribution (and dangling-mass redistribution) becomes uniform
    over the given source set instead of over all vertices.
    ``weight_col`` switches to WEIGHTED PageRank: each out-edge
    carries rank proportional to its (strictly positive) weight
    instead of 1/outdeg — the contribution becomes
    rank(u) * w(u,v) / Σ_x w(u,x). Unweighted is the w ≡ 1 case.
    """
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    wcols = ([F.col(weight_col).cast("double").alias("w")]
             if weight_col else [])
    e = edges.select(F.col("sid").cast("long").alias("src"),
                     F.col("tid").cast("long").alias("dst"), *wcols) \
             .dropDuplicates(["src", "dst"])
    vertices = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_vertices = vertices.count()
    if n_vertices == 0:
        empty = spark.createDataFrame([], "v long, rank double")
        return empty, []
    # Rank-vector partitioning scales with the vertex count, not the
    # global shuffle setting: ~100k vertices per partition. A small
    # vector in one partition broadcasts into the links join and writes
    # one checkpoint file; a 10^9-vertex vector still fans out wide.
    rank_parts = max(1, min(parts, n_vertices // 100_000 + 1))

    # out "degree" = edge count, or total out-weight when weighted —
    # either way the per-link share below is w_link / outdeg
    outdeg = e.groupBy("src").agg(
        (F.sum("w") if weight_col else F.count(F.lit(1))).alias("outdeg"))
    # One-time layout investment, amortized over every superstep: links
    # hash-partitioned AND sorted by src. The cached relation keeps both
    # outputPartitioning and outputOrdering, so the per-superstep
    # links⋈ranks sort-merge join needs NO exchange and NO sort on the
    # 30M-row side — only the small rank vector shuffles+sorts. The
    # remaining per-superstep shuffle is the groupBy(dst) contribution
    # aggregation (map-side partial agg first), which is the
    # algorithmically irreducible one. Hub skew: AQE skew-join splitting
    # plus optional explicit salting (hub_threshold) for degenerate hubs.
    links = (
        e.join(outdeg, "src")
        .select("src", "dst",
                ((F.col("w") if weight_col else F.lit(1.0))
                 / F.col("outdeg")).alias("inv_deg"))
        .repartition(parts, "src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = links.count()
    # One per-vertex side table carries everything the superstep needs:
    # the teleport probability p(v) (uniform, or uniform over
    # reset_vertices for personalized PageRank) and the dangling flag
    # (no out-edges — per-superstep dangling mass then folds into the
    # delta aggregate instead of its own job). One cache, one action.
    if reset_vertices is not None:
        rs = set(int(x) for x in reset_vertices)
        p_col = F.when(F.col("v").isin(rs), F.lit(1.0 / len(rs))).otherwise(F.lit(0.0))
    else:
        p_col = F.lit(1.0 / n_vertices)
    vertex_meta = (
        vertices
        .join(outdeg.withColumnRenamed("src", "v")
              .select("v", F.lit(False).alias("is_dangling")), "v", "left")
        .select("v", p_col.alias("p"),
                F.coalesce(F.col("is_dangling"), F.lit(True)).alias("is_dangling"))
        .repartition(rank_parts, "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_dangling = int(
        vertex_meta.agg(F.sum(F.col("is_dangling").cast("long"))).collect()[0][0] or 0
    )
    vertices.unpersist()
    vertices_p = vertex_meta  # (v, p, is_dangling)
    vflag = vertex_meta

    # Always checkpoint through parquet snapshots: truncates lineage each
    # superstep AND bounds storage (the manager GCs old snapshots), unlike
    # localCheckpoint whose RDDs accumulate until driver GC. An anonymous
    # temp dir serves when the caller doesn't need resumability.
    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="pr_ckpt_"))
    start_iter = 0
    ranks: DataFrame
    if cm and resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        # checkpoints since the fused-superstep change also carry the
        # adelta/dangling_rank audit columns; the loop needs (v, rank)
        ranks = (cm.load(spark, cm.latest()).select("v", "rank")
                 .repartition(rank_parts, "v"))
        d_mass = float(
            ranks.join(vflag, "v").where("is_dangling")
            .agg(F.sum("rank")).collect()[0][0] or 0.0
        )
    else:
        ranks = vertices_p.select("v", F.col("p").alias("rank"))
        if reset_vertices is None:
            d_mass = n_dangling / n_vertices
        else:
            d_mass = float(
                ranks.join(vflag, "v").where("is_dangling")
                .agg(F.sum("rank")).collect()[0][0] or 0.0
            )

    metrics: list[dict] = []
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
        # The superstep's ONE heavy job computes everything per-vertex in
        # a single aligned pass: the new rank, the convergence term
        # |new-old|, and the dangling-mass term — vertices_p, contribs
        # and the old rank vector all join on v (vertices_p and old are
        # already hash(v, rank_parts); only contribs exchanges). The
        # follow-up aggregate job is then a bare 2-column scan of the
        # just-written checkpoint — no joins — instead of a second
        # 3-way join pass over the vector.
        rank_expr = (
            F.lit(1.0 - damping) * F.col("p")
            + F.lit(damping) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                + F.lit(d_mass) * F.col("p"))
        )
        new_ranks = (
            vertices_p.join(contribs.withColumnRenamed("dst", "v"), "v", "left")
            .join(ranks.select("v", F.col("rank").alias("old_rank")), "v")
            .select(
                "v",
                rank_expr.alias("rank"),
                F.abs(rank_expr - F.col("old_rank")).alias("adelta"),
                F.when(F.col("is_dangling"), rank_expr)
                 .otherwise(F.lit(0.0)).alias("dangling_rank"),
            )
        )
        # materialize the new rank vector ONCE (checkpoint = the job);
        # the convergence delta and next superstep's dangling mass ride
        # the checkpoint's own lineage scan (sum_cols) — per superstep
        # that leaves exactly one heavy join job + one column scan
        new_ranks = cm.save(new_ranks.repartition(rank_parts, "v"), it,
                            sum_cols=("adelta", "dangling_rank"))
        sums = cm.metrics[-1]["sums"]
        delta = float(sums["adelta"])
        d_mass = float(sums["dangling_rank"])
        new_ranks = new_ranks.select("v", "rank")
        sec = time.time() - t0
        rec = {
            "iteration": it,
            "l1_delta": delta,
            "sec": round(sec, 4),
            "edges": n_edges,
            "edges_per_sec": round(n_edges / sec, 2),
        }
        cm.amend_last(**{k: v for k, v in rec.items() if k != "iteration"})
        ranks = new_ranks
        metrics.append(rec)
        if delta <= tol:
            break
    return ranks, metrics
