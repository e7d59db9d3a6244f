"""Degree-preserving edge-swap null model (empirical configuration
graph).

The closed-form null entries (g_triangle_null, g_c4_null) compare
observed motif counts against an ANALYTIC configuration-model
expectation. This module builds an EMPIRICAL null: one deterministic
round of double-edge swaps — pair the edges by an LCG order, propose
the crossed rewiring (a1,b1)+(a2,b2) -> (a1,b2)+(a2,b1), accept iff
the swap creates no self-loop, no duplicate inside the pair, and no
edge already present in the original graph — then count triangles on
the rewired graph. Swaps preserve every vertex degree exactly
(cross-pair collisions, where two accepted swaps mint the same edge,
are counted and deduplicated — reported, not hidden).

One round randomizes only partially (a full MCMC mixes for ~E·ln E
swaps); the value here is the DETERMINISTIC, SQL-replicable shape:
both engines derive the identical rewired graph, so the empirical
null is value-checked like any other operator — something a
rand()-driven swap chain could never be.

Scale shape: the pairing is one window rank over the edge list (the
same global-order caveat + two-level escape hatch as every ranked
stage); validity checks are two edge-keyed anti-lookups; triangle
counts use the id-ordered join. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SWAP_A, SWAP_B, SWAP_M = 2_654_435_761, 97, 2_147_483_647


def _tri_count(und: DataFrame):
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    return (e1.join(e2, "x").where(F.col("y") < F.col("z"))
            .join(e3, ["y", "z"])
            .agg(F.count(F.lit(1)).alias("n")))


def edge_swap_null(edges: DataFrame) -> DataFrame:
    """One deterministic double-edge-swap round -> one row
    [n_edges, n_pairs, n_accepted, n_collisions, tri_before,
    tri_after]."""
    und = (edges.select(F.least("sid", "tid").alias("a"),
                        F.greatest("sid", "tid").alias("b"))
           .where(F.col("a") != F.col("b")).distinct()
           .localCheckpoint(eager=True))
    key = (F.col("a") * SWAP_A + F.col("b") * SWAP_B) % SWAP_M
    w = Window.orderBy(key.asc(), F.col("a").asc(), F.col("b").asc())
    ranked = und.withColumn("rn", F.row_number().over(w))
    odd = (ranked.where(F.col("rn") % 2 == 1)
           .select(((F.col("rn") + 1) / 2).cast("long").alias("i"),
                   F.col("a").alias("a1"), F.col("b").alias("b1")))
    even = (ranked.where(F.col("rn") % 2 == 0)
            .select((F.col("rn") / 2).cast("long").alias("i"),
                    F.col("a").alias("a2"), F.col("b").alias("b2")))
    pairs = odd.join(even, "i")
    f1a, f1b = F.least("a1", "b2"), F.greatest("a1", "b2")
    f2a, f2b = F.least("a2", "b1"), F.greatest("a2", "b1")
    cand = pairs.select(
        "a1", "b1", "a2", "b2",
        f1a.alias("f1a"), f1b.alias("f1b"),
        f2a.alias("f2a"), f2b.alias("f2b"))
    lk1 = und.select(F.col("a").alias("f1a"), F.col("b").alias("f1b"),
                     F.lit(1).alias("x1"))
    lk2 = und.select(F.col("a").alias("f2a"), F.col("b").alias("f2b"),
                     F.lit(1).alias("x2"))
    checked = (cand.join(lk1, ["f1a", "f1b"], "left")
               .join(lk2, ["f2a", "f2b"], "left")
               .withColumn("ok",
                           (F.col("f1a") != F.col("f1b"))
                           & (F.col("f2a") != F.col("f2b"))
                           & ~((F.col("f1a") == F.col("f2a"))
                               & (F.col("f1b") == F.col("f2b")))
                           & F.col("x1").isNull() & F.col("x2").isNull()))
    swapped = (checked.where("ok")
               .select(F.col("f1a").alias("a"), F.col("f1b").alias("b"))
               .unionAll(checked.where("ok")
                         .select(F.col("f2a").alias("a"),
                                 F.col("f2b").alias("b"))))
    kept = (checked.where(~F.col("ok"))
            .select(F.col("a1").alias("a"), F.col("b1").alias("b"))
            .unionAll(checked.where(~F.col("ok"))
                      .select(F.col("a2").alias("a"),
                              F.col("b2").alias("b"))))
    n_pairs_df = pairs.agg(F.count(F.lit(1)).alias("_np"))
    unpaired = (ranked.crossJoin(F.broadcast(n_pairs_df))
                .where(F.col("rn") > 2 * F.col("_np"))
                .select("a", "b"))
    rewired_all = swapped.unionAll(kept).unionAll(unpaired)
    rewired = rewired_all.distinct().localCheckpoint(eager=True)
    stats = (und.agg(F.count(F.lit(1)).alias("n_edges"))
             .crossJoin(pairs.agg(F.count(F.lit(1)).alias("n_pairs")))
             .crossJoin(checked.where("ok")
                        .agg(F.count(F.lit(1)).alias("n_accepted")))
             .crossJoin(rewired_all.agg(F.count(F.lit(1)).alias("_n0")))
             .crossJoin(rewired.agg(F.count(F.lit(1)).alias("_n1")))
             .crossJoin(_tri_count(und)
                        .withColumnRenamed("n", "tri_before"))
             .crossJoin(_tri_count(rewired)
                        .withColumnRenamed("n", "tri_after")))
    return stats.select(
        F.col("n_edges").cast("long"),
        F.col("n_pairs").cast("long"),
        F.col("n_accepted").cast("long"),
        (F.col("_n0") - F.col("_n1")).cast("long").alias("n_collisions"),
        F.col("tri_before").cast("long"),
        F.col("tri_after").cast("long"))


def edge_swap_null_sql(edge_sql: str) -> str:
    """DuckDB twin of :func:`edge_swap_null`."""
    return f"""
WITH edge AS MATERIALIZED (
{edge_sql}
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), ranked AS MATERIALIZED (
    SELECT a, b, row_number() OVER (
        ORDER BY (a * {SWAP_A} + b * {SWAP_B}) % {SWAP_M}, a, b) AS rn
    FROM und
), pairs AS MATERIALIZED (
    SELECT o.i, o.a1, o.b1, e.a2, e.b2
    FROM (SELECT CAST((rn + 1) / 2 AS BIGINT) AS i, a AS a1, b AS b1
          FROM ranked WHERE rn % 2 = 1) o
    JOIN (SELECT CAST(rn / 2 AS BIGINT) AS i, a AS a2, b AS b2
          FROM ranked WHERE rn % 2 = 0) e USING (i)
), checked AS MATERIALIZED (
    SELECT *,
           least(a1, b2) AS f1a, greatest(a1, b2) AS f1b,
           least(a2, b1) AS f2a, greatest(a2, b1) AS f2b,
           least(a1, b2) <> greatest(a1, b2)
           AND least(a2, b1) <> greatest(a2, b1)
           AND NOT (least(a1, b2) = least(a2, b1)
                    AND greatest(a1, b2) = greatest(a2, b1))
           AND NOT EXISTS (SELECT 1 FROM und u
                           WHERE u.a = least(a1, b2)
                             AND u.b = greatest(a1, b2))
           AND NOT EXISTS (SELECT 1 FROM und u
                           WHERE u.a = least(a2, b1)
                             AND u.b = greatest(a2, b1)) AS ok
    FROM pairs
), rewired_all AS MATERIALIZED (
    SELECT f1a AS a, f1b AS b FROM checked WHERE ok
    UNION ALL SELECT f2a, f2b FROM checked WHERE ok
    UNION ALL SELECT a1, b1 FROM checked WHERE NOT ok
    UNION ALL SELECT a2, b2 FROM checked WHERE NOT ok
    UNION ALL SELECT a, b FROM ranked
    WHERE rn > 2 * (SELECT count(*) FROM pairs)
), rewired AS MATERIALIZED (
    SELECT DISTINCT a, b FROM rewired_all
), tb AS (
    SELECT count(*) AS n FROM und e1
    JOIN und e2 ON e2.a = e1.a AND e1.b < e2.b
    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
), ta AS (
    SELECT count(*) AS n FROM rewired e1
    JOIN rewired e2 ON e2.a = e1.a AND e1.b < e2.b
    JOIN rewired e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM checked WHERE ok)
           AS n_accepted,
       (SELECT CAST(count(*) AS BIGINT) FROM rewired_all)
           - (SELECT CAST(count(*) AS BIGINT) FROM rewired)
           AS n_collisions,
       CAST(tb.n AS BIGINT) AS tri_before,
       CAST(ta.n AS BIGINT) AS tri_after
FROM tb, ta
""".strip()
