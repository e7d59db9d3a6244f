"""Bridge (cut-edge) detection: BFS spanning forest + fundamental-
cycle cover.

Characterization (Tarjan): fix ANY spanning forest. Every non-tree
edge (u, v) closes one fundamental cycle — the tree paths u→LCA and
v→LCA. A tree edge is a bridge iff NO fundamental cycle covers it;
non-tree edges are never bridges (they sit on their own cycle).

Distributed recipe (all supersteps are equi-joins + aggregates):
  1. hash-min connected components → per-component root = min id,
  2. level-synchronous multi-source BFS from all roots → dist(v);
     parent(v) = min neighbor at dist(v) − 1. Deterministic forest at
     any parallelism,
  3. one walker per non-tree edge, started at its two endpoints; each
     superstep advances the DEEPER endpoint one parent hop (both when
     equally deep), recording each traversed tree edge — identified
     by its child vertex — as covered; the walker dies at the LCA,
  4. bridges = tree edges whose child was never recorded.

Round counts: BFS depth for step 2, ≤ BFS depth again for step 3 —
O(diameter), the small quantity on web-scale link graphs. Walker
volume is the non-tree edge count; each round shuffles walkers by
their current positions (two key joins against the parent table), so
hub skew lands in join hash partitioning, never in per-task loops.
Deep-chain graphs (diameter ≫ log n) would want binary-lifted
ancestor tables to cut rounds to O(log depth); not needed for the
link-graph tier this engine targets.

Reference parity: no bridge operator in the reference; extends the
graph suite (SURVEY §2 "beyond ref"). Oracle: the same forest + walk
expressed as recursive SQL (registry `a_bridges`); the pytest twin is
an independent iterative Tarjan low-link implementation.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

BRIDGE_MAX_ROUNDS = 128


def bridge_edges(spark: SparkSession, edges: DataFrame,
                 max_rounds: int = BRIDGE_MAX_ROUNDS,
                 ) -> tuple[DataFrame, list[dict]]:
    """Returns ([u: long, v: long] with u < v — the bridges — plus
    per-phase metrics). Input treated as undirected; self-loops and
    duplicate/reverse duplicates ignored."""
    from adopt_spark.algos.cc import connected_components

    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid")))
    sym = (e.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
           .unionAll(e.select(F.col("tid").alias("u"),
                              F.col("sid").alias("v")))
           .dropDuplicates(["u", "v"])
           .localCheckpoint(eager=True))
    metrics: list[dict] = []

    t0 = time.time()
    labels, _ = connected_components(spark, e)
    roots = labels.select(F.col("component").alias("v")).distinct()
    metrics.append({"phase": "components",
                    "sec": round(time.time() - t0, 4)})

    # -- multi-source BFS (one frontier join + min-agg per level)
    t0 = time.time()
    dist = (roots.withColumn("d", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    frontier = dist
    depth = 0
    for _ in range(max_rounds):
        nxt = (sym.join(frontier.select(F.col("v").alias("u"), "d"), "u")
               .select("v", (F.col("d") + 1).alias("d"))
               .groupBy("v").agg(F.min("d").alias("d"))
               .join(dist.select("v"), "v", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        # dist stays a lazy union of checkpointed frontiers —
        # re-checkpointing it every round would rewrite O(V) rows per
        # level (O(V·depth) total); every 8 levels bounds the lineage
        dist = dist.unionByName(nxt)
        if depth % 8 == 7:
            dist = dist.localCheckpoint(eager=True)
        frontier = nxt
        depth += 1
    else:
        raise RuntimeError(f"BFS did not converge in {max_rounds} rounds")
    dist = dist.localCheckpoint(eager=True)
    metrics.append({"phase": "bfs", "depth": depth,
                    "sec": round(time.time() - t0, 4)})

    # -- deterministic forest: parent = min neighbor one level up
    du = dist.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dn = dist.select(F.col("v").alias("nbr"), F.col("d").alias("dn"))
    parent = (sym.select(F.col("u"), F.col("v").alias("nbr"))
              .join(du, "u").join(dn, "nbr")
              .where(F.col("dn") == F.col("du") - 1)
              .groupBy(F.col("u").alias("child"))
              .agg(F.min("nbr").alias("par"))
              .localCheckpoint(eager=True))
    tree_und = parent.select(
        F.least("child", "par").alias("a"),
        F.greatest("child", "par").alias("b"))
    und = e.select(F.least("sid", "tid").alias("a"),
                   F.greatest("sid", "tid").alias("b")).distinct()
    nontree = und.join(tree_und, ["a", "b"], "left_anti")

    # -- fundamental-cycle walk: advance the deeper endpoint
    da = dist.select(F.col("v").alias("a"), F.col("d").alias("dua"))
    db = dist.select(F.col("v").alias("b"), F.col("d").alias("dvb"))
    walk = (nontree.join(da, "a").join(db, "b")
            .select(F.col("a").alias("pu"), F.col("b").alias("pv"),
                    F.col("dua").alias("du"), F.col("dvb").alias("dv"))
            .localCheckpoint(eager=True))
    covered = spark.createDataFrame([], "child long")
    pu_par = parent.select(F.col("child").alias("pu"),
                           F.col("par").alias("_paru"))
    pv_par = parent.select(F.col("child").alias("pv"),
                           F.col("par").alias("_parv"))
    t0 = time.time()
    rounds = 0
    for _ in range(max_rounds):
        active = walk.where(F.col("pu") != F.col("pv"))
        n_active = active.count()
        if n_active == 0:
            break
        step_cov = (active.where(F.col("du") >= F.col("dv"))
                    .select(F.col("pu").alias("child"))
                    .unionAll(active.where(F.col("dv") >= F.col("du"))
                              .select(F.col("pv").alias("child"))))
        # lazy accumulation; dedup once at the end (checkpoint every
        # 8 rounds only to keep the union lineage shallow)
        covered = covered.unionByName(step_cov)
        if rounds % 8 == 7:
            covered = covered.localCheckpoint(eager=True)
        walk = (active.join(pu_par, "pu", "left")
                .join(pv_par, "pv", "left")
                .select(
                    F.when(F.col("du") >= F.col("dv"), F.col("_paru"))
                     .otherwise(F.col("pu")).alias("pu"),
                    F.when(F.col("dv") >= F.col("du"), F.col("_parv"))
                     .otherwise(F.col("pv")).alias("pv"),
                    F.when(F.col("du") >= F.col("dv"), F.col("du") - 1)
                     .otherwise(F.col("du")).alias("du"),
                    F.when(F.col("dv") >= F.col("du"), F.col("dv") - 1)
                     .otherwise(F.col("dv")).alias("dv"))
                .localCheckpoint(eager=True))
        rounds += 1
    else:
        raise RuntimeError(f"cycle walk did not converge in "
                           f"{max_rounds} rounds")
    metrics.append({"phase": "walk", "rounds": rounds,
                    "sec": round(time.time() - t0, 4)})

    out = (parent.join(covered.distinct(), "child", "left_anti")
           .select(F.least("child", "par").alias("u"),
                   F.greatest("child", "par").alias("v")))
    return out, metrics


def bridge_report(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Contract shape: the bridge edge list [u: long, v: long], u < v."""
    out, _ = bridge_edges(spark, edges)
    return out.select(F.col("u").cast("long"), F.col("v").cast("long"))


def two_edge_connected_sizes(spark: SparkSession,
                             edges: DataFrame) -> DataFrame:
    """2-edge-connected component size histogram [size, n_components]:
    delete the bridges, re-run hash-min components; a vertex whose
    every incident edge is a bridge is its own (singleton) 2ECC.

    Composition of two existing kernels — the bridge walk and the
    large/small-star CC — so it inherits both scale arguments; the
    only new step is one anti-join of the edge list against the
    bridge list."""
    from adopt_spark.algos.cc import connected_components

    br, _ = bridge_edges(spark, edges)
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid")))
    und = e.select(F.least("sid", "tid").alias("u"),
                   F.greatest("sid", "tid").alias("v")).distinct()
    keep = und.join(br, ["u", "v"], "left_anti")
    comp, _ = connected_components(
        spark, keep.select(F.col("u").alias("sid"),
                           F.col("v").alias("tid")))
    verts = (und.select(F.col("u").alias("v"))
             .unionAll(und.select("v")).distinct())
    singles = (verts.join(comp.select("v"), "v", "left_anti")
               .select("v", F.col("v").alias("component")))
    labels = comp.unionByName(singles)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return (sizes.groupBy("size")
            .agg(F.count(F.lit(1)).alias("n_components")))
