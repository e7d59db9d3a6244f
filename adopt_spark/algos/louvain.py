"""Louvain local-move phase (parity-scheduled, deterministic) — greedy
modularity community detection.

The classic Louvain algorithm (Blondel et al. 2008) alternates a
local-move phase (each vertex greedily joins the neighbor community
with the best modularity gain) with graph coarsening. The sequential
formulation is order-dependent; a FULLY synchronous parallel variant
is order-free but suffers the classic label-swap 2-cycle (two
singleton neighbors adopt each other's community forever and never
merge — measured on the two-triangle fixture). This module therefore
uses the same two-phase parity schedule as lpa.py's semi-synchronous
mode: each sweep first lets odd-id vertices re-decide against the
current assignment, then even-id vertices against the refreshed one.
Deterministic at any parallelism (north-rule requirement), and each
half-step is a pure function of the previous assignment, so the whole
schedule unrolls into SQL (oracle_gen.louvain_fixed_sql is the exact
twin).

Move rule per half-step, all-INTEGER arithmetic (no float ties): with
undirected symmetric neighbor set ``sym``, degree ``k_v = |N(v)|``,
``2m = |sym|``, community totals ``tot_c = Σ_{label(u)=c} k_u`` and
``w_vc = |{u ∈ N(v): label(u) = c}|``, an updating vertex v moves to
community c only if

    score(c) = 2m·w_vc − k_v·(tot_c − k_v·[label(v) = c])

STRICTLY exceeds score(label(v)) — the textbook ΔQ > 0 condition,
scaled by the positive constant 2m² (argmax-invariant) with v's own
degree removed from its current community's total (the "remove v
first" step). Ties among equally-best improving targets break to the
smallest c; a tie WITH the current community means stay (strictness
is what lets two cliques joined by a bridge actually merge instead of
oscillating — measured: two K5s + bridge converge to exactly two
communities in 3 sweeps, where the non-strict rule never converges).

Plan per half-step (all JVM-side Column ops, no Python):
  1. ``tot``  — labels ⋈ degrees, groupBy(label): one narrow-row agg;
  2. ``w_vc`` — sym ⋈ labels(nbr), groupBy(v, c) with map-side partial
     aggregation (hub vertices combine their neighbor-label counts
     before the shuffle);
  3. candidate score join + ``max_by`` argmax with (score, own-flag,
     −c) packed into a struct — no window, no sort.
At 100-TB scale every stage is keyed by v or by label: hub-vertex
skew lands in step 2's partial aggregation, and #labels only shrinks
sweep over sweep, so the ``tot`` aggregate keeps getting smaller.
Reference parity: the reference engine has no community detection;
this extends its graph-analytics suite (SURVEY §2 "beyond ref") the
same way pagerank.py / lpa.py do.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

LOUVAIN_SWEEPS = 6


def louvain_move(
    spark: SparkSession,
    edges: DataFrame,
    sweeps: int = LOUVAIN_SWEEPS,
) -> tuple[DataFrame, list[dict]]:
    """Parity-scheduled Louvain local-move (one level).

    Returns (labels DataFrame[v: long, label: long], metrics). Runs
    exactly ``sweeps`` sweeps (two half-steps each) unless a fixpoint
    is reached earlier — further sweeps would be no-ops, since each
    half-step is a pure function of the previous assignment.
    """
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
              .where(F.col("sid") != F.col("tid")))
    sym = (
        e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
        .unionAll(e.select(F.col("tid").alias("v"), F.col("sid").alias("nbr")))
        .dropDuplicates(["v", "nbr"])
        .localCheckpoint(eager=True)
    )
    degv = sym.groupBy("v").agg(F.count(F.lit(1)).alias("k"))
    degv = degv.localCheckpoint(eager=True)
    two_m = int(sym.count())
    if two_m == 0:
        empty = spark.createDataFrame([], "v long, label long")
        return empty, []

    labels = degv.select("v", F.col("v").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    def half_step(cur: DataFrame, parity: int) -> DataFrame:
        """Vertices with pmod(v,2)==parity re-decide; others keep."""
        tot = (cur.join(degv, "v")
               .groupBy("label").agg(F.sum("k").alias("tot")))
        w_vc = (sym.join(cur.select(F.col("v").alias("nbr"),
                                    F.col("label").alias("c")), "nbr")
                .where(F.pmod(F.col("v"), F.lit(2)) == parity)
                .groupBy("v", "c").agg(F.count(F.lit(1)).alias("w")))
        moving = cur.where(F.pmod(F.col("v"), F.lit(2)) == parity)
        # own community is always a candidate, even with zero
        # same-label neighbors (the w=0 union row loses the max to any
        # real neighbor count)
        cand = (w_vc.unionByName(
                    moving.select("v", F.col("label").alias("c"),
                                  F.lit(0).cast("long").alias("w")))
                .groupBy("v", "c").agg(F.max("w").alias("w")))
        scored = (cand
                  .join(moving.withColumnRenamed("label", "own"), "v")
                  .join(degv, "v")
                  .join(tot, cand["c"] == tot["label"])
                  .select(
                      "v", "c",
                      (F.lit(two_m) * F.col("w")
                       - F.col("k") * (F.col("tot")
                                       - F.when(F.col("c") == F.col("own"),
                                                F.col("k")).otherwise(0)))
                      .alias("score"),
                      (F.col("c") == F.col("own")).cast("int")
                      .alias("is_own")))
        # strict improvement: a top-score tie that includes the current
        # community resolves to staying (is_own outranks the smaller-c
        # tie-break); otherwise the smallest best c wins
        decided = scored.groupBy("v").agg(
            F.max_by("c", F.struct(F.col("score"), F.col("is_own"),
                                   (-F.col("c")))).alias("label"))
        kept = cur.where(F.pmod(F.col("v"), F.lit(2)) != parity)
        return decided.unionByName(kept)

    metrics: list[dict] = []
    for it in range(sweeps):
        t0 = time.time()
        half = half_step(labels, parity=1).localCheckpoint(eager=True)
        new_labels = half_step(half, parity=0).localCheckpoint(eager=True)
        changed = int(
            new_labels.join(labels.withColumnRenamed("label", "old"), "v")
            .where(F.col("label") != F.col("old")).count())
        labels = new_labels
        metrics.append({"iteration": it, "changed": changed,
                        "sec": round(time.time() - t0, 4)})
        if changed == 0:
            break
    return labels, metrics


def louvain_sizes(spark: SparkSession, edges: DataFrame,
                  sweeps: int = LOUVAIN_SWEEPS) -> DataFrame:
    """Community-size histogram [label: long, size: long] of the
    local-move assignment — the contract-facing shape (same as LPA's)."""
    labels, _ = louvain_move(spark, edges, sweeps=sweeps)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("size"))
