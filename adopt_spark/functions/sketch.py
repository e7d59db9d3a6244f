"""Deterministic bottom-k (KMV) distinct-count sketch.

Spark's own approximate distinct (HyperLogLog++ behind
``approx_count_distinct``) is not reproducible outside the JVM, so it
cannot be oracle-checked value-for-value. This KMV sketch is: the
hash is an exact integer multiplicative mix both Spark and DuckDB
evaluate identically, so the *approximate* estimate — not just an
error bound — is bit-equal on both sides, the same shared-hash
replication trick the simhash/LSH oracles use (oracle_gen.py).

Estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream"): keep the k smallest distinct hash values; if fewer than k
exist the count is exact; otherwise estimate (k-1) * M / h_(k) where
h_(k) is the k-th smallest and M the hash-space size.

Scale: the bottom-k is ``distinct().orderBy(h).limit(k)`` — Spark
executes TakeOrdered with per-partition top-k heaps and a k-row
driver merge, so the shuffle carries at most k rows per partition no
matter the input size (the classic mergeable-sketch shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Knuth multiplicative constant, an offset, and a Mersenne-prime-sized
# modulus: exact in BIGINT for keys < ~7e9 (A * key + B < 2^63), and
# identical under Spark pmod and DuckDB % for nonnegative operands.
KMV_A = 2_654_435_761
KMV_B = 104_729
KMV_M = 2_147_483_647  # 2^31 - 1


def kmv_hash(col: Column) -> Column:
    return F.pmod(F.lit(KMV_A) * col.cast("long") + F.lit(KMV_B), F.lit(KMV_M))


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """1-row DataFrame[estimate: double, exact_distinct: bigint].

    ``exact_distinct`` rides along so the contract exposes the
    sketch's error; the estimate itself is deterministic.
    """
    hashes = df.select(kmv_hash(F.col(col)).alias("h")).distinct()
    bottom = hashes.orderBy("h").limit(k)
    best = bottom.agg(F.count(F.lit(1)).alias("nb"), F.max("h").alias("hk"))
    exact = hashes.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return best.crossJoin(exact).select(
        F.when(F.col("nb") < k, F.col("nb").cast("double"))
         .otherwise(F.round(F.lit(float(k - 1)) * F.lit(float(KMV_M))
                            / F.col("hk"), 4))
         .alias("estimate"),
        F.col("exact_distinct"),
    )


def kmv_distinct_sql(table: str, col: str, k: int = 256) -> str:
    """DuckDB twin of kmv_distinct — same hash, same estimator."""
    return f"""
WITH h AS (
    SELECT DISTINCT ({KMV_A} * CAST({col} AS BIGINT) + {KMV_B}) % {KMV_M} AS h
    FROM {table}
), b AS (SELECT h FROM h ORDER BY h LIMIT {k})
SELECT CASE WHEN (SELECT count(*) FROM b) < {k}
            THEN CAST((SELECT count(*) FROM b) AS DOUBLE)
            ELSE round({k - 1} * {KMV_M}.0 / (SELECT max(h) FROM b), 4)
       END AS estimate,
       (SELECT CAST(count(*) AS BIGINT) FROM h) AS exact_distinct
""".strip()


def kmv_distinct_by(df: DataFrame, group_col: str, col: str,
                    k: int = 256) -> DataFrame:
    """Per-group KMV: DataFrame[group_col, estimate, exact_distinct].

    Declarative per-group bottom-k: distinct (group, hash) pairs,
    then a rank window ordered by hash within each group. The window
    sorts only DISTINCT hashes per group (the distinct aggregation
    partially combines map-side first); for billion-key groups swap
    in the same per-partition heap + merge the global kmv_distinct
    gets from TakeOrdered.
    """
    g = F.col(group_col)
    hashes = df.select(g, kmv_hash(F.col(col)).alias("h")).distinct()
    from pyspark.sql import Window
    ranked = hashes.withColumn(
        "rn", F.row_number().over(Window.partitionBy(g).orderBy("h")))
    return (
        ranked.groupBy(group_col)
        .agg(F.sum((F.col("rn") <= k).cast("long")).alias("nb"),
             F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("hk"),
             F.count(F.lit(1)).alias("exact_distinct"))
        .select(
            group_col,
            F.when(F.col("nb") < k, F.col("nb").cast("double"))
             .otherwise(F.round(F.lit(float(k - 1)) * F.lit(float(KMV_M))
                                / F.col("hk"), 4))
             .alias("estimate"),
            "exact_distinct",
        )
    )


def kmv_distinct_by_sql(table: str, group_col: str, col: str,
                        k: int = 256) -> str:
    """DuckDB twin of kmv_distinct_by."""
    return f"""
WITH h AS (
    SELECT DISTINCT {group_col},
           ({KMV_A} * CAST({col} AS BIGINT) + {KMV_B}) % {KMV_M} AS h
    FROM {table}
), r AS (
    SELECT {group_col}, h,
           row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
    FROM h
)
SELECT {group_col},
       CASE WHEN sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) < {k}
            THEN CAST(sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS DOUBLE)
            ELSE round({k - 1} * {KMV_M}.0
                       / max(CASE WHEN rn <= {k} THEN h END), 4)
       END AS estimate,
       CAST(count(*) AS BIGINT) AS exact_distinct
FROM r GROUP BY {group_col}
""".strip()
