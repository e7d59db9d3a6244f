"""Deterministic Luby maximal independent set.

Classic Luby (1986) round structure with a *deterministic* priority in
place of the per-round coin flips: p(v) = (v mod P) * 2654435761 mod P
(Knuth multiplicative hash, P = 1e9+7 — the (v mod P) pre-reduction
keeps the product inside int64 for any vertex id). A vertex joins the
MIS when its (p(v), v) pair is strictly smaller than every UNDECIDED
neighbor's; its neighbors drop out; repeat until no vertex is
undecided. Fully deterministic at any parallelism (north-rule
requirement) and replicable in ANSI SQL, which is what the DuckDB
contract oracle does (oracle_gen.mis_fixed_sql unrolls the rounds).

Round count is O(log n) in expectation for hashed priorities (the same
argument as Luby's random-permutation analysis); the sf0.01 contract
graph converges in 7 rounds.

Plan per round (all JVM-side, no Python):
  * restrict the symmetric adjacency to undecided-undecided edges
    (two semi-ish inner joins against the shrinking undecided set);
  * one groupBy(v).min(struct(p, nbr)) — partial-aggregated, so the
    shuffle carries one row per undecided vertex, not per edge;
  * winners = undecided left-joined to that min (null min = isolated
    undecided vertex, which always joins);
  * undecided -= winners + their neighbors.
The adjacency is localCheckpointed once; each round checkpoints only
the O(|undecided|) frontier state, so lineage stays flat.

Reference scope: the reference engine (jxiw/ADOPT) has no iterative
graph algorithms — its surface is the join-order problem over motif
queries (see SURVEY.md §2.3). MIS belongs to the north-rule
link-graph tier this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MIS_PRIME = 1_000_000_007
MIS_MULT = 2_654_435_761


def _pri(col):
    return (F.col(col) % MIS_PRIME) * F.lit(MIS_MULT) % MIS_PRIME


def luby_mis(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Maximal independent set of the undirected graph.

    Returns DataFrame[v: long] — the MIS members. Raises if the
    graph has not fully decided within ``max_rounds`` (hashed
    priorities make that bound astronomically generous).
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    sym = (
        e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
        .unionAll(e.select(F.col("tid").alias("v"), F.col("sid").alias("nbr")))
        .dropDuplicates(["v", "nbr"])
        .localCheckpoint(eager=True)
    )
    und = sym.select("v").distinct() \
             .withColumn("pk", F.struct(_pri("v").alias("p"), F.col("v"))) \
             .localCheckpoint(eager=True)
    mis_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        if und.isEmpty():
            spark = edges.sparkSession
            if not mis_parts:
                return spark.createDataFrame([], "v long")
            out = mis_parts[0]
            for part in mis_parts[1:]:
                out = out.unionAll(part)
            return out
        # undecided-undecided adjacency, tagged with the neighbor's key
        uu = (
            sym.join(und.select("v"), "v")
               .join(und.select(F.col("v").alias("nbr"), F.col("pk").alias("npk")),
                     "nbr")
        )
        nbr_min = uu.groupBy("v").agg(F.min("npk").alias("min_npk"))
        winners = (
            und.join(nbr_min, "v", "left")
               .where(F.col("min_npk").isNull()
                      | (F.col("pk") < F.col("min_npk")))
               .select("v")
               .localCheckpoint(eager=True)
        )
        mis_parts.append(winners)
        knocked = (
            sym.join(winners.withColumnRenamed("v", "nbr"), "nbr")
               .select("v").distinct()
        )
        und = (
            und.join(winners.unionAll(knocked).distinct(), "v", "left_anti")
               .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"luby_mis did not converge in {max_rounds} rounds")


def greedy_coloring(edges: DataFrame, max_colors: int = 64,
                    max_rounds: int = 64,
                    stats: dict | None = None) -> DataFrame:
    """Proper vertex coloring by MIS peeling -> [v, color].

    Pass ``stats={}`` to receive the measured schedule back:
    ``stats["rounds_per_color"]`` = inner-MIS depth actually used per
    color. Gates at other scale factors calibrate the unrolled DuckDB
    oracle's (color, round) budget from this with a 2x margin
    (scripts/calibrate_oracle_budgets.py).

    Color c = the deterministic Luby MIS of the still-uncolored
    induced subgraph; its members take c and leave. Every peel is a
    proper color class by MIS independence; peeling terminates
    because each MIS is maximal (nonempty while vertices remain).
    Color count is bounded by degeneracy+1-ish in practice (7 on the
    sf0.01 bounded contract subgraph); this is the standard
    distributed coloring construction (Luby 1986 §5).

    Unlike ``luby_mis`` the inner loop tracks the VERTEX set, so a
    vertex isolated inside the uncolored subgraph (all neighbors
    already colored) joins the current MIS in round 1 via the
    no-smaller-undecided-neighbor test going vacuous. The DuckDB
    oracle (oracle_gen.coloring_fixed_sql) unrolls the same fixed
    (color, round) schedule; over-budget steps are no-ops, so the
    engine's early stopping and the unrolled SQL agree exactly.
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    sym = (
        e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
        .unionAll(e.select(F.col("tid").alias("v"), F.col("sid").alias("nbr")))
        .dropDuplicates(["v", "nbr"])
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    unc = sym.select("v").distinct() \
             .withColumn("pk", F.struct(_pri("v").alias("p"), F.col("v"))) \
             .localCheckpoint(eager=True)
    colored_parts: list[DataFrame] = []

    for c in range(max_colors):
        if unc.isEmpty():
            if not colored_parts:
                return spark.createDataFrame([], "v long, color int")
            out = colored_parts[0]
            for part in colored_parts[1:]:
                out = out.unionAll(part)
            return out
        und = unc
        mis_parts: list[DataFrame] = []
        rounds_used = 0
        for _ in range(max_rounds):
            if und.isEmpty():
                break
            rounds_used += 1
            uu = (
                sym.join(und.select("v"), "v")
                   .join(und.select(F.col("v").alias("nbr"),
                                    F.col("pk").alias("npk")), "nbr")
            )
            nbr_min = uu.groupBy("v").agg(F.min("npk").alias("min_npk"))
            winners = (
                und.join(nbr_min, "v", "left")
                   .where(F.col("min_npk").isNull()
                          | (F.col("pk") < F.col("min_npk")))
                   .select("v")
                   .localCheckpoint(eager=True)
            )
            mis_parts.append(winners)
            knocked = (
                sym.join(winners.withColumnRenamed("v", "nbr"), "nbr")
                   .select("v").distinct()
            )
            und = (
                und.join(winners.unionAll(knocked).distinct(), "v",
                         "left_anti")
                   .localCheckpoint(eager=True)
            )
        else:
            raise RuntimeError(
                f"greedy_coloring: inner MIS not done in {max_rounds} rounds")
        if stats is not None:
            stats.setdefault("rounds_per_color", []).append(rounds_used)
        mis = mis_parts[0]
        for part in mis_parts[1:]:
            mis = mis.unionAll(part)
        mis = mis.localCheckpoint(eager=True)
        colored_parts.append(
            mis.select("v", F.lit(c).cast("int").alias("color")))
        unc = unc.join(mis, "v", "left_anti").localCheckpoint(eager=True)
    raise RuntimeError(f"greedy_coloring exceeded {max_colors} colors")
