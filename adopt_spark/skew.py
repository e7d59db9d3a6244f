"""Explicit skew handling: hub-vertex salting.

The reference fights skew by re-splitting unfinished hypercubes at the
value-space frontier (joining/join/wcoj/Hypercube.java:105-121) so no
worker owns a disproportionate slice. The Spark-native equivalents we
use, in order:

  1. AQE skew-join splitting (session.py turns it on) — the automatic
     path, covers sort-merge joins.
  2. Explicit salting (this module) — for aggregations and joins keyed
     by vertex where one hub vertex dominates a partition: split the
     hub's rows across S salts, aggregate partially per salt, then
     merge. This is a two-level aggregation, i.e. map-side combine
     made explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_group_sum(df: DataFrame, key: str, value: str, out: str,
                     salts: int = 16) -> DataFrame:
    """groupBy(key).sum(value) via two-level salted aggregation.

    Deterministic salt = a cheap hash of other columns would break the
    partial-agg property; we use pmod(hash of the *value row id proxy*)
    — here simply a round-robin on the value's bit pattern is not
    needed because Spark's hash-agg already does partial aggregation.
    This helper exists for the pathological case where a single key's
    partials still overflow one reducer: stage 1 groups on
    (key, salt), stage 2 on key.
    """
    salt: Column = F.pmod(F.hash(F.col(value)), F.lit(salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").alias(out))


def hub_vertices(degree_df: DataFrame, threshold: int) -> DataFrame:
    """Vertices whose degree exceeds threshold: DataFrame[v, deg]."""
    return degree_df.where(F.col("deg") > threshold)


def salted_contributions(links: DataFrame, ranks: DataFrame,
                         hub_threshold: int, salts: int = 16) -> DataFrame:
    """PageRank contribution aggregation with hub salting.

    links: [src, dst, inv_deg]; ranks: [v, rank].
    Contributions grouped by dst; a hub dst (in-degree > threshold)
    would funnel its entire in-neighborhood through one reducer, so we
    pre-aggregate per (dst, salt) first. Non-hub keys skip the extra
    shuffle by unioning the two paths.
    """
    contrib = (
        links.join(ranks.withColumnRenamed("v", "src"), "src")
        .select("dst", (F.col("rank") * F.col("inv_deg")).alias("c"))
    )
    indeg = links.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    hubs = hub_vertices(indeg, hub_threshold).select("dst")
    hub_part = (
        contrib.join(F.broadcast(hubs), "dst")
        .withColumn("_salt", F.pmod(F.hash("c"), F.lit(salts)))
        .groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
        .groupBy("dst").agg(F.sum("c").alias("contrib"))
    )
    rest = (
        contrib.join(F.broadcast(hubs), "dst", "left_anti")
        .groupBy("dst").agg(F.sum("c").alias("contrib"))
    )
    return hub_part.unionAll(rest)


# LCG mixer both engines compute EXACTLY in int64 arithmetic (no
# overflow for vertex ids < ~8.3e9; ANSI mode would throw, not wrap,
# if that bound were crossed). This is the portable stand-in for the
# engine's real partitioner hash — the METRICS (cut fraction, balance,
# replication) are the object of study, not the hash itself.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2_147_483_648


def _lcg_part(col: Column, k: int) -> Column:
    return ((col * _LCG_A + _LCG_C) % _LCG_M) % k


def partition_quality(edges: DataFrame, k: int) -> DataFrame:
    """Edge-cut / balance / replication metrics for candidate graph
    partitioners — the planning query behind a 100-TB layout choice.

    Three strategies over k partitions:
      * ``hash``  — vertices assigned by the LCG mixer; reports edges
        cut (endpoints in different partitions), cut fraction, and
        balance = max/mean of per-partition endpoint counts.
      * ``range`` — contiguous id ranges (min..max split k ways);
        same metrics. Range placement preserves id locality, so on
        id-correlated graphs its cut is far lower — the measured
        value of locality-aware layout.
      * ``edge_hash_vertex_cut`` — the PowerGraph-style dual: EDGES
        are hash-assigned and vertices replicate; reports the mean
        vertex replication factor (avg distinct partitions touching
        each vertex's edges).

    Everything is two aggregates per strategy on exact integer
    arithmetic — a metadata-scale query whatever the edge count.
    Output: (strategy, n_edges, edges_cut, cut_frac, balance,
    repl_factor); inapplicable cells are NULL.
    """
    if k <= 1:
        raise ValueError(f"k must be >= 2, got {k}")
    e = edges.select(F.col("sid").cast("long"),
                     F.col("tid").cast("long"))
    lohi = e.agg(F.least(F.min("sid"), F.min("tid")).alias("lo"),
                 F.greatest(F.max("sid"), F.max("tid")).alias("hi"))
    lo, hi = F.col("lo"), F.col("hi")

    def cut_row(name: str, assigned: DataFrame) -> DataFrame:
        bal = (assigned.select(F.explode(F.array("_ps", "_pt"))
                               .alias("p"))
               .groupBy("p").agg(F.count(F.lit(1)).alias("n"))
               .agg((F.max("n") / F.avg("n")).alias("bal")))
        return (assigned.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum((F.col("_ps") != F.col("_pt")).cast("long"))
            .alias("edges_cut"))
            .crossJoin(bal)
            .select(F.lit(name).alias("strategy"),
                    "n_edges", "edges_cut",
                    F.round(F.col("edges_cut") / F.col("n_edges"), 6)
                    .alias("cut_frac"),
                    F.round("bal", 6).alias("balance"),
                    F.lit(None).cast("double").alias("repl_factor")))

    hash_row = cut_row("hash", e.select(
        "sid", "tid",
        _lcg_part(F.col("sid"), k).alias("_ps"),
        _lcg_part(F.col("tid"), k).alias("_pt")))

    def rng(c: Column) -> Column:
        return F.least(F.lit(k - 1),
                       F.floor((c - lo) * k / (hi - lo + 1))
                       .cast("long"))
    range_row = cut_row("range", e.crossJoin(F.broadcast(lohi)).select(
        "sid", "tid", rng(F.col("sid")).alias("_ps"),
        rng(F.col("tid")).alias("_pt")))

    ep = ((F.col("sid") * _LCG_A + F.col("tid") * _LCG_C + 99991)
          % _LCG_M) % k
    repl = (e.select(ep.alias("p"), "sid", "tid")
            .select("p", F.explode(F.array("sid", "tid")).alias("v"))
            .groupBy("v").agg(F.count_distinct("p").alias("r"))
            .agg(F.round(F.avg("r"), 6).alias("repl")))
    vcut_row = (e.agg(F.count(F.lit(1)).alias("n_edges"))
                .crossJoin(repl)
                .select(F.lit("edge_hash_vertex_cut").alias("strategy"),
                        "n_edges",
                        F.lit(None).cast("long").alias("edges_cut"),
                        F.lit(None).cast("double").alias("cut_frac"),
                        F.lit(None).cast("double").alias("balance"),
                        F.col("repl").alias("repl_factor")))
    return hash_row.unionByName(range_row).unionByName(vcut_row)


def partition_quality_sql(edge_cte: str, k: int) -> str:
    """DuckDB twin of :func:`partition_quality` (same LCG mixer)."""
    a, c, m = _LCG_A, _LCG_C, _LCG_M

    def cut_block(name: str, ps: str, pt: str) -> str:
        return f"""
SELECT '{name}' AS strategy,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN {ps} <> {pt} THEN 1 ELSE 0 END) AS BIGINT)
           AS edges_cut,
       round(sum(CASE WHEN {ps} <> {pt} THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS cut_frac,
       (SELECT round(max(n) / avg(n), 6) FROM (
            SELECT p, count(*) AS n FROM (
                SELECT {ps} AS p FROM ebounds
                UNION ALL SELECT {pt} FROM ebounds
            ) GROUP BY p
        )) AS balance,
       CAST(NULL AS DOUBLE) AS repl_factor
FROM ebounds"""

    hash_ps = f"(((sid * {a} + {c}) % {m}) % {k})"
    hash_pt = f"(((tid * {a} + {c}) % {m}) % {k})"
    rng_ps = (f"least({k - 1}, CAST(floor((sid - lo) * {k}"
              f" / (hi - lo + 1)) AS BIGINT))")
    rng_pt = (f"least({k - 1}, CAST(floor((tid - lo) * {k}"
              f" / (hi - lo + 1)) AS BIGINT))")
    return f"""
WITH edge AS (
{edge_cte}
), bounds AS (
    SELECT least(min(sid), min(tid)) AS lo,
           greatest(max(sid), max(tid)) AS hi
    FROM edge
), ebounds AS (
    SELECT e.sid, e.tid, b.lo, b.hi FROM edge e CROSS JOIN bounds b
)
{cut_block('hash', hash_ps, hash_pt)}
UNION ALL
{cut_block('range', rng_ps, rng_pt)}
UNION ALL
SELECT 'edge_hash_vertex_cut', CAST((SELECT count(*) FROM edge) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       (SELECT round(avg(r), 6) FROM (
            SELECT v, count(DISTINCT p) AS r FROM (
                SELECT ((sid * {a} + tid * {c} + 99991) % {m}) % {k} AS p,
                       sid AS v FROM edge
                UNION ALL
                SELECT ((sid * {a} + tid * {c} + 99991) % {m}) % {k},
                       tid FROM edge
            ) GROUP BY v
        ))
""".strip()
