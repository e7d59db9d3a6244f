"""SimRank structural-similarity scores (Jeh & Widom 2002).

"Two pages are similar when similar pages link to them":
    s(a, a) = 1
    s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i, j)
with I(v) the in-neighbor set. Fixed-iteration synchronous evaluation
(the standard truncated power form — iteration k bounds the exact
fixpoint within C^k), which makes the computation a pure join-
aggregate DP the DuckDB oracle unrolls verbatim
(registry SIMRANK_SQL), like PageRank/Katz/LPA.

State is the nonzero PAIR table — it starts as the diagonal and grows
only to pairs connected through shared ancestry, so on sparse graphs
it stays far below |V|²; per iteration the plan is two equi-joins
(extend both pair ends along in-edges) + one (a, b) hash aggregate
with map-side partial agg + one scale join against the in-degree
table. All JVM-side. SimRank's O(|V|²) worst-case state is real —
callers bound the vertex set (the contract query uses the same
bounded dense subgraph as the SCC/bow-tie entries) or switch to the
single-pair / top-k random-walk estimators for web-scale inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SIMRANK_C = 0.8
SIMRANK_ITERS = 5


def simrank(spark: SparkSession, edges: DataFrame,
            iters: int = SIMRANK_ITERS, c: float = SIMRANK_C) -> DataFrame:
    """All-pairs truncated SimRank -> [a, b, s] for a != b with s > 0
    (unrounded; diagonal omitted). Deterministic at any parallelism.
    """
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid"))
         .dropDuplicates(["sid", "tid"])
         .localCheckpoint(eager=True))
    verts = (e.select(F.col("sid").alias("v"))
             .union(e.select(F.col("tid").alias("v")))
             .distinct())
    indeg = e.groupBy(F.col("tid").alias("v")).agg(
        F.count(F.lit(1)).alias("d")).localCheckpoint(eager=True)

    diag = verts.select(F.col("v").alias("a"), F.col("v").alias("b"),
                        F.lit(1.0).alias("s"))
    cur = diag.localCheckpoint(eager=True)
    for _ in range(iters):
        summed = (
            cur.join(e.select(F.col("sid").alias("a"),
                              F.col("tid").alias("na")), "a")
               .join(e.select(F.col("sid").alias("b"),
                              F.col("tid").alias("nb")), "b")
               .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
               .agg(F.sum("s").alias("ssum"))
               .where(F.col("a") != F.col("b"))
        )
        offdiag = (
            summed.join(indeg.select(F.col("v").alias("a"),
                                     F.col("d").alias("da")), "a")
                  .join(indeg.select(F.col("v").alias("b"),
                                     F.col("d").alias("db")), "b")
                  .select("a", "b",
                          ((F.lit(c) * F.col("ssum"))
                           / (F.col("da") * F.col("db"))).alias("s"))
        )
        cur = diag.unionAll(offdiag).localCheckpoint(eager=True)
    return cur.where(F.col("a") != F.col("b"))
