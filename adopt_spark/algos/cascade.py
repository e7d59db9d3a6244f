"""Bootstrap percolation / threshold cascade (influence spread).

Deterministic k-threshold cascade over the undirected graph
(Chalupa-Leath-Reich bootstrap percolation; the Kempe-Kleinberg-Tardos
linear-threshold model with a uniform integer threshold): a seed set
starts active, and an inactive vertex activates in round i+1 iff at
least ``theta`` of its neighbors are active after round i. Activation
is MONOTONE (never deactivates), so the synchronous schedule is
order-free, converges in ≤ |V| rounds, and a fixed SQL unroll
(oracle_gen.cascade_fixed_sql) is exact — rounds past the fixpoint
are no-ops.

Plan per round: one join of the edge list against the active set +
one count-aggregate + one threshold filter — the paths.py superstep
shape. The active set is keyed by v with map-side partial counts, so
hub skew lands in the partial aggregation; the frontier-only variant
(join only NEW activations, keep running neighbor counts) is the
constant-factor optimization for deep cascades and is deliberately
not used here: the fixture cascades are ≤ 6 rounds deep and the
full-recount plan keeps every round a pure function of the active
set (what the unrolled oracle mirrors).

Reference parity: no cascade operators in the reference; extends the
graph-analytics suite (SURVEY §2 "beyond ref").
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

CASCADE_ROUNDS = 10
CASCADE_THETA = 2
CASCADE_SEEDS = 25


def threshold_cascade(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    theta: int = CASCADE_THETA,
    rounds: int = CASCADE_ROUNDS,
) -> tuple[DataFrame, list[dict]]:
    """Returns ([v: long, round: int] — activation round, 0 = seed;
    only activated vertices appear — plus per-round metrics)."""
    if theta < 1:
        raise ValueError(f"theta must be >= 1, got {theta}")
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
              .where(F.col("sid") != F.col("tid")))
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("nbr")))
           .dropDuplicates(["v", "nbr"])
           .localCheckpoint(eager=True))
    active = (seeds.select(F.col("v").cast("long"))
              .distinct()
              .withColumn("round", F.lit(0).cast("int"))
              .localCheckpoint(eager=True))
    metrics: list[dict] = []
    for it in range(1, rounds + 1):
        t0 = time.time()
        cnt = (sym.join(active.select(F.col("v").alias("nbr")), "nbr")
               .groupBy("v").agg(F.count(F.lit(1)).alias("n_active")))
        newly = (cnt.where(F.col("n_active") >= theta)
                 .join(active.select("v"), "v", "left_anti")
                 .select("v", F.lit(it).cast("int").alias("round")))
        n_new = newly.count()
        if n_new == 0:
            metrics.append({"iteration": it, "activated": 0,
                            "sec": round(time.time() - t0, 4)})
            break
        active = active.unionByName(newly).localCheckpoint(eager=True)
        metrics.append({"iteration": it, "activated": int(n_new),
                        "sec": round(time.time() - t0, 4)})
    return active, metrics


def cascade_report(spark: SparkSession, edges: DataFrame,
                   n_seeds: int = CASCADE_SEEDS,
                   theta: int = CASCADE_THETA,
                   rounds: int = CASCADE_ROUNDS) -> DataFrame:
    """Contract shape: activation rounds from the ``n_seeds`` lowest
    vertex ids, [v: long, round: int]."""
    verts = (edges.selectExpr("sid AS v").unionAll(edges.selectExpr("tid"))
             .distinct())
    seeds = verts.orderBy("v").limit(n_seeds)
    active, _ = threshold_cascade(spark, edges, seeds, theta=theta,
                                  rounds=rounds)
    return active.select(F.col("v").cast("long"),
                         F.col("round").cast("int"))
