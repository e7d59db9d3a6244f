"""Join-cardinality profiling — the planner statistic ADOPT adapts to.

ADOPT's whole premise (paper §1; the UCT order learner the SURVEY
maps to measured dispatch) is that equi-join output cardinalities are
what static optimizers get wrong, so the engine must either estimate
them well or adapt at runtime. This module computes the EXACT join
output size — |A ⋈ B| = Σ_k cA(k)·cB(k) over matching keys — without
running the join: two key-count aggregations (map-side partial agg)
plus one count-table equi-join whose width is the number of DISTINCT
matching keys, not the join output. That is how a 100-TB planner
decides broadcast-vs-shuffle, detects a fan-out blowup before paying
for it, and finds the hot key that needs salting (``top_key_share``
is exactly the skew statistic skew.py salts on).

Exactness discipline: per-key products accumulate in decimal(38,0)
(a 100-TB fan-out can exceed int64; ANSI mode would throw) and the
result is emitted as BIGINT at the query edge; ``top_key_share`` is
one double division of exact integers, rounded 6 dp.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

JoinSpec = tuple[str, DataFrame, str, DataFrame, str]


def join_size_profile(specs: list[JoinSpec]) -> DataFrame:
    """-> (join_name, est_rows, n_match_keys, top_key_share).

    ``specs``: (name, left_df, left_key, right_df, right_key) per
    candidate equi-join. ``est_rows`` is the exact inner-join output
    cardinality; ``top_key_share`` the largest single key's fraction
    of it (0.0 for an empty join).
    """
    outs = []
    for name, left, lkey, right, rkey in specs:
        ca = left.groupBy(F.col(lkey).alias("k")).agg(
            F.count(F.lit(1)).alias("ca"))
        cb = right.groupBy(F.col(rkey).alias("k")).agg(
            F.count(F.lit(1)).alias("cb"))
        contrib = (F.col("ca").cast("decimal(38,0)")
                   * F.col("cb").cast("decimal(38,0)"))
        agg = ca.join(cb, "k").agg(
            F.coalesce(F.sum(contrib), F.lit(0).cast("decimal(38,0)"))
             .alias("est"),
            F.coalesce(F.max(contrib), F.lit(0).cast("decimal(38,0)"))
             .alias("mx"),
            F.count(F.lit(1)).alias("n_match_keys"))
        outs.append(agg.select(
            F.lit(name).alias("join_name"),
            F.col("est").cast("long").alias("est_rows"),
            F.col("n_match_keys"),
            F.when(F.col("est") > 0,
                   F.round(F.col("mx").cast("double")
                           / F.col("est").cast("double"), 6))
             .otherwise(F.lit(0.0)).alias("top_key_share")))
    return reduce(DataFrame.unionAll, outs)


def join_size_profile_sql(
        specs: list[tuple[str, str, str, str, str]]) -> str:
    """DuckDB twin; ``specs``: (name, left_table, left_key,
    right_table, right_key)."""
    parts = []
    for name, ltab, lkey, rtab, rkey in specs:
        parts.append(f"""
SELECT '{name}' AS join_name,
       CAST(coalesce(sum(contrib), 0) AS BIGINT) AS est_rows,
       CAST(count(*) AS BIGINT) AS n_match_keys,
       CASE WHEN coalesce(sum(contrib), 0) > 0
            THEN round(CAST(max(contrib) AS DOUBLE)
                       / CAST(sum(contrib) AS DOUBLE), 6)
            ELSE 0.0 END AS top_key_share
FROM (
    SELECT CAST(ca.c AS HUGEINT) * CAST(cb.c AS HUGEINT) AS contrib
    FROM (SELECT {lkey} AS k, count(*) AS c FROM {ltab} GROUP BY 1) ca
    JOIN (SELECT {rkey} AS k, count(*) AS c FROM {rtab} GROUP BY 1) cb
    USING (k)
)""".strip())
    return "\nUNION ALL\n".join(parts)
