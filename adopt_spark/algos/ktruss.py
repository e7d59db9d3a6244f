"""k-truss decomposition: per-edge truss numbers by support peeling.

The k-truss of a graph is the maximal subgraph in which every edge
participates in >= k-2 triangles (Cohen 2008); the truss number
t(e) is the largest k whose truss contains e. Trusses are the
edge-analogue of k-cores — denser, more cohesive, and built directly
on the engine's WCOJ triangle machinery, so this is the natural
"ADOPT-adjacent" decomposition (the reference only counts triangles;
SURVEY.md §2.3).

Algorithm (the standard distributed peel, mirroring kcore.py's
incremental schedule): for k = 3, 4, ... peel the k-truss out of the
surviving (k-1)-truss — repeatedly drop edges with support < k-2
until a fixpoint, then move to k+1 on the survivors. Total work is
one triangle enumeration per round over a shrinking edge set.

Per-round Spark plan:
  * support: degree-oriented wedge join + closing join (identical
    plan shape to triangles.triangle_count_join — fan-out O(sqrt E))
    enumerates each surviving triangle once; its three edges are
    exploded in canonical (lo, hi) form and count-aggregated
    (map-side partial agg), then an inner join keeps edges meeting
    the support threshold. Two shuffles per round beyond the
    orientation, both key-bounded.
  * convergence: survivor count unchanged (one action per round).

Output is per-edge (sid, tid, truss) with truss >= 2 (every edge is
trivially in the 2-truss), deterministic and parallelism-independent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.edges import orient_by_degree


def _lt(edges: DataFrame) -> DataFrame:
    return (edges.where(F.col("sid") < F.col("tid"))
            .dropDuplicates(["sid", "tid"]))


def edge_supports(lt: DataFrame) -> DataFrame:
    """DataFrame[sid, tid, support] for edges in >= 1 triangle."""
    o = orient_by_degree(lt)
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = (e1.join(e2, "a").where(F.col("b") != F.col("c"))
            .join(e3, ["b", "c"]))
    sides = tris.select(F.explode(F.array(
        F.struct(F.least("a", "b").alias("sid"),
                 F.greatest("a", "b").alias("tid")),
        F.struct(F.least("a", "c").alias("sid"),
                 F.greatest("a", "c").alias("tid")),
        F.struct(F.least("b", "c").alias("sid"),
                 F.greatest("b", "c").alias("tid")),
    )).alias("e")).select("e.sid", "e.tid")
    return sides.groupBy("sid", "tid").agg(F.count(F.lit(1)).alias("support"))


def truss_numbers(
    spark: SparkSession,
    edges: DataFrame,
    k_max: int = 30,
    max_rounds: int = 100,
    method: str = "auto",
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[sid, tid, truss], metrics).

    ``method="full"`` — the round-2 plan: a FULL triangle enumeration
    per peel round (support recomputed from scratch). Simple, but the
    sf0.1 gate measured it grinding through thousands of (k, round)
    full re-enumerations on the dense graph.

    ``method="delta"`` (= ``"auto"``, the default since round 5) —
    supports only change when edges DROP, so the triangle enumeration
    runs exactly ONCE, up front; every subsequent round enumerates
    only the triangles incident to that round's dropped set (each
    dropped (u,v) joined against the pre-drop adjacency for common
    neighbors, triple-deduped so a triangle with 2-3 dropped edges
    decrements each survivor exactly once) and decrements the
    survivors' supports. Supports carry across k stages (nothing
    drops between stage fixpoints), so the per-(k,round) cost is
    drop-proportional — the same frontier-delta discipline as
    algos/cc.py's default plan. Identical output to "full"
    (asserted in tests/test_ktruss.py at every fixture).
    """
    if method == "auto":
        method = "delta"
    if method not in ("full", "delta"):
        raise ValueError(f"unknown method: {method}")
    if method == "delta":
        return _truss_delta(spark, edges, k_max, max_rounds)
    lt = _lt(edges).localCheckpoint(eager=True)
    n_cur = lt.count()
    stages: list[tuple[int, DataFrame]] = [(2, lt)]
    metrics: list[dict] = []
    cur = lt
    k = 3
    while n_cur > 0 and k <= k_max:
        rounds = 0
        for _ in range(max_rounds):
            t0 = time.time()
            sup = edge_supports(cur)
            survivors = (cur.join(sup, ["sid", "tid"])
                         .where(F.col("support") >= k - 2)
                         .select("sid", "tid")
                         .localCheckpoint(eager=True))
            n_next = survivors.count()
            rounds += 1
            metrics.append({"k": k, "round": rounds, "edges": n_next,
                            "sec": round(time.time() - t0, 4)})
            dropped = n_cur - n_next
            cur, n_cur = survivors, n_next
            if dropped == 0:
                break
        else:
            raise RuntimeError(f"truss peel at k={k} exceeded {max_rounds}")
        if n_cur > 0:
            stages.append((k, cur))
        k += 1

    return _tag_stages(stages), metrics


def _tag_stages(stages: list[tuple[int, DataFrame]]) -> DataFrame:
    tagged = None
    for kk, df in stages:
        t = df.select("sid", "tid", F.lit(kk).alias("truss"))
        tagged = t if tagged is None else tagged.unionAll(t)
    return tagged.groupBy("sid", "tid").agg(F.max("truss").alias("truss"))


def _truss_delta(spark: SparkSession, edges: DataFrame, k_max: int,
                 max_rounds: int) -> tuple[DataFrame, list[dict]]:
    """Delta-support peel; see truss_numbers."""
    # AQE's partition coalescing sees tiny per-round stats and will
    # happily collapse the whole peel to ONE partition, serializing
    # every subsequent round (observed at sf0.1: a 30min single task
    # for a 10s parallel job) — pin the state frame's partitioning
    parts = max(8, spark.sparkContext.defaultParallelism)
    lt = _lt(edges).localCheckpoint(eager=True)
    sup0 = edge_supports(lt)
    supf = (lt.join(sup0, ["sid", "tid"], "left")
            .select("sid", "tid",
                    F.coalesce("support", F.lit(0)).alias("support"))
            .repartition(parts, "sid", "tid")
            .localCheckpoint(eager=True))
    n_cur = supf.count()
    stages: list[tuple[int, DataFrame]] = [(2, supf.select("sid", "tid"))]
    metrics: list[dict] = []
    k = 3
    while n_cur > 0 and k <= k_max:
        rounds = 0
        for _ in range(max_rounds):
            t0 = time.time()
            drop = (supf.where(F.col("support") < k - 2)
                    .select("sid", "tid").localCheckpoint(eager=True))
            n_drop = drop.count()
            if n_drop == 0:
                break
            rounds += 1
            surv = supf.where(F.col("support") >= k - 2)
            # symmetric view of the PRE-drop edge set: common-neighbor
            # probes for the dropped edges run against it, so every
            # triangle killed this round is found (incl. those whose
            # other edges are also dropping — the triple dedup below
            # makes each survivor lose exactly 1 per dead triangle)
            sym = (supf.select(F.col("sid").alias("x"),
                               F.col("tid").alias("y"))
                   .unionAll(supf.select(F.col("tid").alias("x"),
                                         F.col("sid").alias("y"))))
            cand = (drop.select(F.col("sid").alias("u"),
                                F.col("tid").alias("v"))
                    .join(sym.select(F.col("x").alias("u"),
                                     F.col("y").alias("w")), "u"))
            tri = cand.join(sym.select(F.col("x").alias("v"),
                                       F.col("y").alias("w")),
                            ["v", "w"])
            triple = (tri.select(F.array_sort(
                F.array("u", "v", "w")).alias("t")).distinct()
                .select(F.col("t")[0].alias("a"),
                        F.col("t")[1].alias("b"),
                        F.col("t")[2].alias("c")))
            sides = triple.select(F.explode(F.array(
                F.struct(F.col("a").alias("sid"), F.col("b").alias("tid")),
                F.struct(F.col("a").alias("sid"), F.col("c").alias("tid")),
                F.struct(F.col("b").alias("sid"), F.col("c").alias("tid")),
            )).alias("e")).select("e.sid", "e.tid")
            dec = sides.groupBy("sid", "tid").agg(
                F.count(F.lit(1)).alias("dec"))
            supf = (surv.join(dec, ["sid", "tid"], "left")
                    .select("sid", "tid",
                            (F.col("support")
                             - F.coalesce("dec", F.lit(0)))
                            .alias("support"))
                    .repartition(parts, "sid", "tid")
                    .localCheckpoint(eager=True))
            n_cur = supf.count()
            metrics.append({"k": k, "round": rounds, "edges": n_cur,
                            "dropped": n_drop,
                            "sec": round(time.time() - t0, 4)})
        else:
            raise RuntimeError(f"truss peel at k={k} exceeded {max_rounds}")
        if n_cur > 0:
            stages.append((k, supf.select("sid", "tid")))
        k += 1
    return _tag_stages(stages), metrics
