"""Local community detection: personalized-PageRank sweep cut
(Andersen-Chung-Lang, FOCS'06).

The classic local clustering recipe: rank vertices by ppr(v)/deg(v)
from a seed's personalized PageRank, then scan prefixes S_1 c S_2 c
... of that order and score each by conductance

    phi(S) = cut(S) / min(vol(S), vol(V \\ S))

The sweep's guarantee (ACL Thm. 1) is that some prefix's conductance
approximates the best community containing the seed. This engine
emits the WHOLE sweep curve — (k, v, ppr, cut, vol, phi) for every
prefix — because the curve is what an analyst reads (local minima =
nested communities), and because it makes the operator value-checkable
row for row rather than only at the argmin.

Scale shape: PPR is the production power iteration (algos/pagerank.py
— rank-vector-only shuffles, fixed supersteps here for oracle
parity). The sweep itself needs prefix sums over the RANKED VERTEX
frame: cut(k) telescopes as
    cut(k) = #{edges with min_rank <= k} - #{edges with max_rank <= k}
so one edge-ranks join + two per-k count aggregates + running sums
give the whole curve without ever materializing prefix x edge pairs.
The running sums use a global-order window over the vertex-count-sized
frame — at 10^9 vertices swap for the standard two-level prefix sum
(per-partition partials, broadcast offsets); the shape of everything
upstream (joins + hash aggs) is already partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from adopt_spark.algos.pagerank import pagerank


def ppr_sweep(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = 12,
    seed: int | None = None,
) -> DataFrame:
    """Sweep-cut curve from ``seed`` (default: min vertex id) over the
    undirected lt-canonical graph -> (k, v, ppr, cut, vol, phi) for
    every prefix k = 1..n-1, phi at 6 dp.

    PPR runs tol=0 for exactly ``iters`` supersteps (teleport AND
    dangling mass to the seed, r0 = the seed distribution — the same
    law as a_pagerank_personal), then is 6 dp-quantized BEFORE the
    ppr/deg ordering so cross-engine libm drift cannot reorder the
    sweep. Ordering ties break on vertex id.
    """
    lt = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
          .where(F.col("sid") < F.col("tid")).dropDuplicates(["sid", "tid"]))
    sym = lt.unionAll(lt.select(F.col("tid").alias("sid"),
                                F.col("sid").alias("tid")))
    if seed is None:
        seed = int(sym.agg(F.min("sid")).collect()[0][0])
    ranks, _ = pagerank(spark, sym, tol=0.0, max_iter=iters,
                        reset_vertices=[int(seed)])
    deg = sym.groupBy(F.col("sid").alias("v")).agg(
        F.count(F.lit(1)).alias("deg"))
    scored = (ranks.select("v", F.round("rank", 6).alias("ppr"))
              .join(deg, "v")
              .withColumn("ratio", F.col("ppr") / F.col("deg")))
    w_rank = Window.orderBy(F.desc("ratio"), F.asc("v"))
    ranked = scored.withColumn("k", F.row_number().over(w_rank))

    ru = ranked.select(F.col("v").alias("sid"), F.col("k").alias("ku"))
    rv = ranked.select(F.col("v").alias("tid"), F.col("k").alias("kv"))
    er = (lt.join(ru, "sid").join(rv, "tid")
          .select(F.least("ku", "kv").alias("kmin"),
                  F.greatest("ku", "kv").alias("kmax")))
    per_in = er.groupBy(F.col("kmin").alias("k")).agg(
        F.count(F.lit(1)).alias("n_in"))
    per_out = er.groupBy(F.col("kmax").alias("k")).agg(
        F.count(F.lit(1)).alias("n_out"))
    tot = ranked.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("deg").alias("vol_all"))

    w_cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    curve = (ranked.join(per_in, "k", "left").join(per_out, "k", "left")
             .withColumn("vol", F.sum("deg").over(w_cum))
             .withColumn("cut",
                         F.sum(F.coalesce("n_in", F.lit(0))).over(w_cum)
                         - F.sum(F.coalesce("n_out", F.lit(0))).over(w_cum))
             .crossJoin(F.broadcast(tot))
             .where(F.col("k") < F.col("n")))
    denom = F.least(F.col("vol"), F.col("vol_all") - F.col("vol"))
    return curve.select(
        F.col("k").cast("long"), "v", "ppr",
        F.col("cut").cast("long").alias("cut"),
        F.col("vol").cast("long").alias("vol"),
        F.round(F.col("cut") / denom, 6).alias("phi"))


def best_community(spark: SparkSession, edges: DataFrame,
                   iters: int = 12, seed: int | None = None) -> DataFrame:
    """The sweep's argmin prefix: one row (k, phi, vol, cut) for the
    lowest-conductance community containing the seed (ties -> smallest
    k, the tightest such community)."""
    curve = ppr_sweep(spark, edges, iters=iters, seed=seed)
    w = Window.orderBy(F.asc("phi"), F.asc("k"))
    return (curve.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("k", "phi", "vol", "cut"))
