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


# ------------------------------------------------------ count-min sketch

CMS_WIDTH = 64
# one (multiplier, offset) pair per depth row; same int64-safety
# argument as KMV_A/KMV_B above
CMS_ROWS = [(2_654_435_761, 104_729),
            (2_246_822_519, 12_582_917),
            (3_266_489_917, 402_653_189)]


def count_min_estimates(df: DataFrame, col: str,
                        width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of the ``col`` frequency distribution +
    point estimates for every distinct key -> [key, est, n_true].

    Build: each row hashes into one bucket per depth row
    (h_d(x) = (A_d·x + B_d) mod M mod width) — one groupBy(d, bucket)
    whose state is depth×width counters regardless of input size:
    the mergeable-sketch shape (partial aggregation IS the sketch
    merge). Estimate: min over depth rows of the key's bucket count —
    always ≥ the true count; equality iff the key shares no bucket
    with colliders on every row. Returning n_true alongside makes the
    overestimate property auditable (and oracle-checkable) per key.

    The hash is exact BIGINT arithmetic replicated by the DuckDB
    oracle (shared-hash replication, like KMV above). Keys must be
    nonnegative integers.
    """
    x = F.col(col).cast("long")
    sk = None
    for d, (a, b) in enumerate(CMS_ROWS):
        bucket = ((x % KMV_M) * F.lit(a) + F.lit(b)) % KMV_M % width
        part = df.select(F.lit(d).alias("d"), bucket.alias("bucket"))
        sk = part if sk is None else sk.unionAll(part)
    counters = sk.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("c"))

    keys = df.groupBy(x.alias("key")).agg(F.count(F.lit(1)).alias("n_true"))
    probes = None
    for d, (a, b) in enumerate(CMS_ROWS):
        kb = ((F.col("key") % KMV_M) * F.lit(a) + F.lit(b)) % KMV_M % width
        p = keys.select("key", "n_true", F.lit(d).alias("d"),
                        kb.alias("bucket"))
        probes = p if probes is None else probes.unionAll(p)
    return (probes.join(counters, ["d", "bucket"])
            .groupBy("key", "n_true").agg(F.min("c").alias("est"))
            .select("key", "est", "n_true"))


def count_min_estimates_sql(table: str, col: str,
                            width: int = CMS_WIDTH) -> str:
    """DuckDB twin of count_min_estimates (same constants)."""
    builds, probes = [], []
    for d, (a, b) in enumerate(CMS_ROWS):
        h = (f"(((CAST({col} AS BIGINT) % {KMV_M}) * {a} + {b}) "
             f"% {KMV_M}) % {width}")
        builds.append(f"SELECT {d} AS d, {h} AS bucket FROM {table}")
        probes.append(f"SELECT key, n_true, {d} AS d, "
                      f"(((key % {KMV_M}) * {a} + {b}) % {KMV_M}) % {width} "
                      f"AS bucket FROM keys")
    return f"""
WITH counters AS (
    SELECT d, bucket, count(*) AS c
    FROM ({' UNION ALL '.join(builds)}) GROUP BY d, bucket
), keys AS (
    SELECT CAST({col} AS BIGINT) AS key, count(*) AS n_true
    FROM {table} GROUP BY 1
), pr AS ({' UNION ALL '.join(probes)})
SELECT pr.key, min(c.c) AS est, pr.n_true
FROM pr JOIN counters c USING (d, bucket)
GROUP BY pr.key, pr.n_true"""
