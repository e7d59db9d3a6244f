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


def _normalize(edges: DataFrame) -> DataFrame:
    return (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
            .where(F.col("sid") != F.col("tid"))
            .select(F.least("sid", "tid").alias("a"),
                    F.greatest("sid", "tid").alias("b"))
            .distinct()
            .withColumn("w", F.lit(1).cast("long"))
            .localCheckpoint(eager=True))


def _cascade(und: DataFrame, levels: int,
             rounds: int) -> tuple[list[DataFrame], list[DataFrame]]:
    """Run the coarsening cascade; returns (graphs, maps) where
    graphs[L] is level L's (a, b, w) frame (graphs[0] = input) and
    maps[L] is level L+1's matched-b map DataFrame[v, sv] (identity
    entries omitted — absent v maps to itself)."""
    graphs, maps = [und], []
    for _ in range(levels):
        m = _match_fixed(und, rounds)
        # matched b -> a; everything else -> itself. The map is
        # vertex-sized; identity rows are left implicit.
        mapped_b = (m.select(F.col("b").alias("v"), F.col("a").alias("sv"))
                    .localCheckpoint(eager=True))
        und = (und
               .join(mapped_b.select(F.col("v").alias("a"),
                                     F.col("sv").alias("sa")), "a", "left")
               .join(mapped_b.select(F.col("v").alias("b"),
                                     F.col("sv").alias("sb")), "b", "left")
               .select(F.coalesce("sa", F.col("a")).alias("sa"),
                       F.coalesce("sb", F.col("b")).alias("sb"), "w")
               .where(F.col("sa") != F.col("sb"))
               .select(F.least("sa", "sb").alias("a"),
                       F.greatest("sa", "sb").alias("b"), "w")
               .groupBy("a", "b").agg(F.sum("w").cast("long").alias("w"))
               .localCheckpoint(eager=True))
        graphs.append(und)
        maps.append(mapped_b)
    return graphs, maps


def coarsen_graph(edges: DataFrame, levels: int = COARSEN_LEVELS,
                  rounds: int = COARSEN_ROUNDS) -> DataFrame:
    """Coarsening cascade report.

    Returns DataFrame[level int, n_vertices long, n_edges long,
    total_weight long] for level 0 (the input undirected simple graph,
    unit weights) through ``levels``.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1: {levels}")
    graphs, _ = _cascade(_normalize(edges), levels, rounds)

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

    reports = [summary(lvl, g) for lvl, g in enumerate(graphs)]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("level")


def multilevel_partition(edges: DataFrame, k: int = 4,
                         levels: int = COARSEN_LEVELS,
                         rounds: int = COARSEN_ROUNDS) -> DataFrame:
    """k-way partitioning quality: coarsen-then-project vs direct hash.

    The coarsest supervertices are hash-assigned (``sv % k``) and the
    assignment is PROJECTED back through the cascade maps, so each
    matched pair lands in one part at every level — the cut can only
    see edges the matching never contracted. The same ``v % k`` rule
    applied directly at level 0 is the baseline. One row per strategy:

      DataFrame[strategy, cut_weight long, total_weight long,
                cut_frac double (6 dp), max_part long]

    Lower cut_frac for 'coarsen_project' on structured graphs is the
    measured value of the cascade (on hash-random graphs the two tie).
    Plan: L vertex-sized map joins + two edge-table lookups + two
    metadata-scale aggregates; nothing driver-resident.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    und0 = _normalize(edges)
    _, maps = _cascade(und0, levels, rounds)

    verts = (und0.select(F.col("a").alias("v"))
             .unionAll(und0.select(F.col("b").alias("v")))
             .distinct())
    # compose the cascade maps: v -> coarsest supervertex
    proj = verts.select("v", F.col("v").alias("sv"))
    for mp in maps:
        proj = (proj.join(mp.select(F.col("v").alias("sv"),
                                    F.col("sv").alias("nsv")), "sv", "left")
                .select("v", F.coalesce("nsv", F.col("sv")).alias("sv")))
    assign_ml = proj.select("v", F.pmod(F.col("sv"), F.lit(k)).alias("part"))
    assign_hash = verts.select("v", F.pmod(F.col("v"), F.lit(k)).alias("part"))

    def report(name: str, assign: DataFrame) -> DataFrame:
        g = (und0
             .join(assign.select(F.col("v").alias("a"),
                                 F.col("part").alias("pa")), "a")
             .join(assign.select(F.col("v").alias("b"),
                                 F.col("part").alias("pb")), "b"))
        cut = g.agg(
            F.sum(F.when(F.col("pa") != F.col("pb"), F.col("w"))
                  .otherwise(F.lit(0))).cast("long").alias("cut_weight"),
            F.sum("w").cast("long").alias("total_weight"))
        bal = (assign.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
               .agg(F.max("n").cast("long").alias("max_part")))
        return (cut.crossJoin(bal)
                .select(F.lit(name).alias("strategy"), "cut_weight",
                        "total_weight",
                        F.round(F.col("cut_weight")
                                / F.col("total_weight"), 6)
                        .alias("cut_frac"),
                        "max_part"))

    return (report("coarsen_project", assign_ml)
            .unionAll(report("hash_direct", assign_hash))
            .orderBy("strategy"))
