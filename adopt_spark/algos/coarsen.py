"""Multilevel graph coarsening (random-matching scheme).

The first phase of every multilevel graph partitioner (METIS family,
Karypis & Kumar SIAM '98): repeatedly contract a matching so the
graph shrinks geometrically while preserving cut structure — the
coarsest level is then partitioned and refined back up. At 10^12-edge
scale the coarsening cascade IS the partitioning job; each level is
pure relational work (one matching + two mapping joins + one
aggregate), so it distributes the same way the algorithms it serves
do. This implements the RM (random matching) scheme with the
deterministic Luby matching from algos/matching.py — same priority
law, fixed round count, replayable at any parallelism and in SQL
(oracle_gen.coarsen_sql).

Per level, over the undirected weighted simple graph (a, b, w):

  1. fixed-round Luby matching M on the edge SET (weights ignored —
     RM, not heavy-edge; the priority hash is the 'random' choice);
  2. supervertex map: matched (a, b) -> a (the smaller endpoint),
     every other endpoint -> itself;
  3. contraction: map both endpoints, drop self-loops (the matched
     edge itself), re-normalize (least, greatest), SUM weights over
     parallel edges.

Vertex counts are endpoint counts of the level's edge set (a matched
pair whose only edge was internal becomes isolated and leaves the
graph — documented; both engines count identically).

Reference scope: out-of-reference (jxiw/ADOPT has no iterative graph
algorithms); north-rule link-graph tier, composing with
skew.partition_quality (the coarsened graph is what a partitioner
actually cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from adopt_spark.algos.matching import _edge_pri

COARSEN_LEVELS = 2
COARSEN_ROUNDS = 12   # per-level Luby rounds; past convergence = no-op


def _match_fixed(und: DataFrame, rounds: int) -> DataFrame:
    """Fixed-round Luby matching over (a, b) pairs; returns matched
    DataFrame[a, b]. Identical semantics to algos/matching.py's loop
    (rounds past convergence are no-ops), but never raises — a
    partial matching is a valid coarsening step."""
    spark = und.sparkSession
    act = (und.select("a", "b")
           .withColumn("pk", F.struct(_edge_pri().alias("p"),
                                      F.col("a"), F.col("b")))
           .localCheckpoint(eager=True))
    parts: list[DataFrame] = []
    for _ in range(rounds):
        if act.isEmpty():
            break
        inc = (act.select(F.col("a").alias("v"), "pk")
               .unionAll(act.select(F.col("b").alias("v"), "pk")))
        vmin = inc.groupBy("v").agg(F.min("pk").alias("mpk"))
        winners = (
            act.join(vmin.select(F.col("v").alias("a"),
                                 F.col("mpk").alias("mpk_a")), "a")
               .join(vmin.select(F.col("v").alias("b"),
                                 F.col("mpk").alias("mpk_b")), "b")
               .where((F.col("pk") == F.col("mpk_a"))
                      & (F.col("pk") == F.col("mpk_b")))
               .select("a", "b")
               .localCheckpoint(eager=True))
        parts.append(winners)
        mv = (winners.select(F.col("a").alias("v"))
              .unionAll(winners.select(F.col("b").alias("v")))
              .distinct())
        act = (act.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
               .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
               .select("a", "b", "pk")
               .localCheckpoint(eager=True))
    if not parts:
        return und.sparkSession.createDataFrame([], "a long, b long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def coarsen_graph(edges: DataFrame, levels: int = COARSEN_LEVELS,
                  rounds: int = COARSEN_ROUNDS) -> DataFrame:
    """Coarsening cascade report.

    Returns DataFrame[level int, n_vertices long, n_edges long,
    total_weight long] for level 0 (the input undirected simple graph,
    unit weights) through ``levels``.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1: {levels}")
    spark = edges.sparkSession
    und = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
           .where(F.col("sid") != F.col("tid"))
           .select(F.least("sid", "tid").alias("a"),
                   F.greatest("sid", "tid").alias("b"))
           .distinct()
           .withColumn("w", F.lit(1).cast("long"))
           .localCheckpoint(eager=True))

    def summary(lvl: int, g: DataFrame) -> DataFrame:
        verts = (g.select(F.col("a").alias("v"))
                 .unionAll(g.select(F.col("b").alias("v"))))
        return (verts.agg(F.countDistinct("v").alias("n_vertices"))
                .crossJoin(g.agg(
                    F.count(F.lit(1)).alias("n_edges"),
                    F.coalesce(F.sum("w"), F.lit(0)).cast("long")
                     .alias("total_weight")))
                .select(F.lit(lvl).cast("int").alias("level"),
                        "n_vertices", "n_edges", "total_weight"))

    reports = [summary(0, und)]
    for lvl in range(1, levels + 1):
        m = _match_fixed(und, rounds)
        # matched b -> a; everything else -> itself. One anti-join
        # derives the identity part; the map is vertex-sized.
        mapped_b = m.select(F.col("b").alias("v"), F.col("a").alias("sv"))
        verts = (und.select(F.col("a").alias("v"))
                 .unionAll(und.select(F.col("b").alias("v")))
                 .distinct())
        ident = (verts.join(mapped_b.select("v"), "v", "left_anti")
                 .select("v", F.col("v").alias("sv")))
        vmap = mapped_b.unionAll(ident)

        und = (und
               .join(vmap.select(F.col("v").alias("a"),
                                 F.col("sv").alias("sa")), "a")
               .join(vmap.select(F.col("v").alias("b"),
                                 F.col("sv").alias("sb")), "b")
               .where(F.col("sa") != F.col("sb"))
               .select(F.least("sa", "sb").alias("a"),
                       F.greatest("sa", "sb").alias("b"), "w")
               .groupBy("a", "b").agg(F.sum("w").cast("long").alias("w"))
               .localCheckpoint(eager=True))
        reports.append(summary(lvl, und))

    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("level")
