"""Deterministic greedy maximal matching (parallel, Luby-style).

The matching twin of algos/mis.py: an undirected edge joins the
matching when its deterministic priority is the strict minimum among
all still-active edges sharing either endpoint — i.e. a Luby MIS on
the line graph, with the hashed priority replacing coin flips. The
winner test needs NO edge-edge join: an edge conflicts only through
its endpoints, so "min among conflicting edges" ⟺ "min of the
incident-edge priorities at BOTH endpoints" — one explode + one
per-vertex min + two equi-joins per round, all JVM-side.

Priority (int64-safe for any vertex id, replicated exactly by the
DuckDB oracle in oracle_gen.matching_fixed_sql):
    pkey = ((a mod P) * 2000003 + (b mod P)) mod P
    p    = pkey * 2654435761 mod P,   P = 1e9+7
ties broken by (a, b). Rounds are O(log E) in expectation (Luby's
analysis on the line graph); the sf0.01 contract graph converges in
9 rounds.

Reference scope: out-of-reference (jxiw/ADOPT has no iterative graph
algorithms); part of the north-rule link-graph tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME

MATCH_EDGE_MIX = 2_000_003


def _edge_pri():
    pkey = ((F.col("a") % MIS_PRIME) * MATCH_EDGE_MIX
            + (F.col("b") % MIS_PRIME)) % MIS_PRIME
    return (pkey * F.lit(MIS_MULT)) % MIS_PRIME


def greedy_matching(edges: DataFrame, max_rounds: int = 4096) -> DataFrame:
    """Maximal matching of the undirected graph.

    Returns DataFrame[sid: long, tid: long] — the matched edges,
    normalized sid < tid. Each round matches >= 1 edge (the globally
    extremal active edge is always locally dominant), so termination
    within |matching| rounds is guaranteed; ``max_rounds`` is a
    safety valve only (the sf0.1 dense contract graph measures 68
    rounds — the old 64 cap tripped there, round-4 fix).
    Raises if not converged in ``max_rounds``.
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    act = (
        e.select(F.least("sid", "tid").alias("a"),
                 F.greatest("sid", "tid").alias("b"))
        .distinct()
        .withColumn("pk", F.struct(_edge_pri().alias("p"),
                                   F.col("a"), F.col("b")))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    matched_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        if act.isEmpty():
            if not matched_parts:
                return spark.createDataFrame([], "sid long, tid long")
            out = matched_parts[0]
            for part in matched_parts[1:]:
                out = out.unionAll(part)
            return out
        inc = (
            act.select(F.col("a").alias("v"), "pk")
               .unionAll(act.select(F.col("b").alias("v"), "pk"))
        )
        vmin = inc.groupBy("v").agg(F.min("pk").alias("mpk"))
        winners = (
            act.join(vmin.select(F.col("v").alias("a"),
                                 F.col("mpk").alias("mpk_a")), "a")
               .join(vmin.select(F.col("v").alias("b"),
                                 F.col("mpk").alias("mpk_b")), "b")
               .where((F.col("pk") == F.col("mpk_a"))
                      & (F.col("pk") == F.col("mpk_b")))
               .select(F.col("a").alias("sid"), F.col("b").alias("tid"))
               .localCheckpoint(eager=True)
        )
        matched_parts.append(winners)
        mv = (winners.select(F.col("sid").alias("v"))
              .unionAll(winners.select(F.col("tid").alias("v")))
              .distinct())
        act = (
            act.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
               .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
               .select("a", "b", "pk")
               .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"greedy_matching did not converge in {max_rounds} rounds")


def weighted_matching(edges: DataFrame, max_rounds: int = 4096,
                      stats: dict | None = None) -> DataFrame:
    """Locally-dominant weighted matching (Preis / Manne-Bisseling):
    an active edge joins when its (weight, tie) is the strict MAX
    among all active edges sharing either endpoint — the distributed
    1/2-approximation of maximum weight matching, and the weighted
    generalization of greedy_matching (same one-explode + per-vertex
    extremum + two equi-joins round shape; a locally-dominant edge
    always exists, so rounds are O(log E) like the unweighted case).

    Edge weights are the deterministic contract law
    (paths.contract_weight on the canonical (a, b)); ties break on
    (a, b), so the matching is unique and the unrolled SQL twin
    (oracle_gen.weighted_matching_sql) replays it exactly. Returns
    DataFrame[sid, tid, w] — the matched edges, sid < tid.
    """
    from adopt_spark.algos.paths import contract_weight

    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    act = (
        e.select(F.least("sid", "tid").alias("a"),
                 F.greatest("sid", "tid").alias("b"))
        .distinct()
        .withColumn("w", contract_weight(F.col("a"), F.col("b"))
                    .cast("long"))
        .withColumn("pk", F.struct((-F.col("w")).alias("nw"),
                                   F.col("a"), F.col("b")))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    matched_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        if act.isEmpty():
            if not matched_parts:
                return spark.createDataFrame([], "sid long, tid long, w long")
            out = matched_parts[0]
            for part in matched_parts[1:]:
                out = out.unionAll(part)
            return out
        if stats is not None:
            # rounds actually used — gates at other scale factors
            # calibrate the unrolled oracle budget from this
            stats["rounds"] = stats.get("rounds", 0) + 1
        inc = (
            act.select(F.col("a").alias("v"), "pk")
               .unionAll(act.select(F.col("b").alias("v"), "pk"))
        )
        vmin = inc.groupBy("v").agg(F.min("pk").alias("mpk"))
        winners = (
            act.join(vmin.select(F.col("v").alias("a"),
                                 F.col("mpk").alias("mpk_a")), "a")
               .join(vmin.select(F.col("v").alias("b"),
                                 F.col("mpk").alias("mpk_b")), "b")
               .where((F.col("pk") == F.col("mpk_a"))
                      & (F.col("pk") == F.col("mpk_b")))
               .select(F.col("a").alias("sid"), F.col("b").alias("tid"),
                       "w")
               .localCheckpoint(eager=True)
        )
        matched_parts.append(winners)
        mv = (winners.select(F.col("sid").alias("v"))
              .unionAll(winners.select(F.col("tid").alias("v")))
              .distinct())
        act = (
            act.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
               .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
               .select("a", "b", "w", "pk")
               .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"weighted_matching did not converge in {max_rounds} rounds")
