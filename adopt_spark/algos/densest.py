"""Densest subgraph by greedy (1+eps)-peel — BKV, VLDB 2012.

North-of-reference graph surface (the reference counts motifs only,
graph_query/*.sql): the densest-subgraph problem asks for the vertex
set S maximizing density |E(S)| / |S|. Exact solutions need max-flow;
the distributed standard is Bahmani-Kumar-Vattani's greedy peel: each
round removes EVERY vertex whose degree is at most 2(1+eps) times the
current density, tracks the densest intermediate subgraph seen, and
provably finishes in O(log n / eps) rounds with a 2(1+eps)
approximation. With eps = 1/2 the removal test is the exact integer
predicate  deg(v) * |S| <= 3 * |E(S)|  — no floats anywhere, so the
Spark run and the unrolled DuckDB oracle (oracle_gen.densest_fixed_sql)
agree bit-for-bit and the result is parallelism-independent.

Per round: one explode+groupBy for degrees (map-side partial agg), ONE
stats action (vertex count + degree sum off the same small frame), two
semi-joins to shrink the edge list, and a localCheckpoint for lineage
truncation. The vertex set S is implicit — vertices with at least one
surviving edge — so isolated leftovers (which only dilute density)
drop out automatically on both sides. Threshold arithmetic runs in
decimal(38,0): deg * |V| stays exact up to ~1e38, far past the
10^12-vertex design point where int64 would overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# measured on the sf0.01 sparse contract graph: empty after 4 rounds
# (15297 -> 1791 -> 340 -> 300 -> 0 edges); 3x margin
DENSEST_ROUNDS = 12


def densest_subgraph(spark: SparkSession, edges: DataFrame,
                     max_rounds: int = DENSEST_ROUNDS) -> DataFrame:
    """Vertices of the densest subgraph found by the eps=1/2 peel.

    Returns DataFrame[v: long, round: int, nv: long, ne: long] — one
    row per vertex of the best intermediate subgraph, tagged with the
    round it was observed at and its exact size/edge count (density =
    ne/nv). Empty input -> empty result. Ties on density keep the
    EARLIEST round (the larger subgraph), via strict cross-multiplied
    integer comparison — the SQL twin uses the same rule.
    """
    und = (
        edges.select(F.least("sid", "tid").alias("a"),
                     F.greatest("sid", "tid").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = und.localCheckpoint(eager=True)
    best_ne, best_nv, best_round = 0, 1, -1
    best_v: DataFrame | None = None
    for i in range(max_rounds):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        row = deg.agg(F.count(F.lit(1)).alias("nv"),
                      F.sum("deg").alias("degsum")).first()
        nv = int(row["nv"] or 0)
        ne = int(row["degsum"] or 0) // 2
        if ne == 0:
            break
        if ne * best_nv > best_ne * nv:  # exact density improvement
            best_ne, best_nv, best_round = ne, nv, i
            best_v = deg.select("v").localCheckpoint(eager=True)
        lhs = F.col("deg").cast("decimal(38,0)") * \
            F.lit(str(nv)).cast("decimal(38,0)")
        keep = deg.where(lhs > F.lit(str(3 * ne)).cast("decimal(38,0)")) \
                  .select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    if best_v is None:
        return spark.createDataFrame([], "v long, round int, nv long, ne long")
    return best_v.select(
        F.col("v").cast("long").alias("v"),
        F.lit(best_round).cast("int").alias("round"),
        F.lit(best_nv).cast("long").alias("nv"),
        F.lit(best_ne).cast("long").alias("ne"),
    )
