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


# ------------------------------------------------------ HyperLogLog

HLL_B = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_ALPHA = 0.709              # bias constant for m = 64
# second prime modulus for the 3-round mix (M1 = KMV_M = 2^31 - 1).
# A single LCG round mod one prime leaves consecutive keys as an
# arithmetic progression whose trailing-zero stats are badly skewed
# (measured ~2x overestimate); alternating the modulus between rounds
# breaks the linearity, restoring the ~13% error m=64 should give.
HLL_M2 = 2_147_483_629


def _hll_mix_sql(col: str) -> str:
    """3-round engine-portable integer mix -> [0, KMV_M)."""
    h1 = f"(({KMV_A} * CAST({col} AS BIGINT) + {KMV_B}) % {KMV_M})"
    h2 = f"(({h1} * 2246822519 + 12582917) % {HLL_M2})"
    return f"(({h2} * 3266489917 + {KMV_B}) % {KMV_M})"


def _hll_rho_sql(col: str) -> str:
    """rho(w) for w = hash >> HLL_B: 1 + trailing zeros, engine-portable
    (same bit trick as algos/anf.py); w == 0 degenerates to the cap."""
    # floor-div spelled portably: Spark lacks //, DuckDB lacks DIV
    w = f"(cast(floor(({col}) / {HLL_M}.0) as bigint))"
    return f"(least(bit_count(({w} & -{w}) - 1), 25) + 1)"


def hll_distinct_by(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-group HyperLogLog distinct estimate ->
    [group_col, estimate: double, exact_distinct: bigint].

    Spark's own approx_count_distinct IS HLL++ but its registers are
    JVM-private; this one uses the shared integer hash (KMV constants)
    so DuckDB replays the identical registers and the estimate —
    including the small-range linear-counting branch — is
    value-checked, not just bounded. Build shape: one groupBy on
    (group, bucket) with max(rho) — fixed 64-register state per group,
    partial agg IS the sketch merge, the mergeable-sketch scale story.
    ``exact_distinct`` rides along to expose the sketch error.
    """
    g = F.col(group_col)
    # the SAME mix/rho SQL strings the DuckDB twin embeds — the two
    # sides cannot drift (CAST/% parse identically on both engines for
    # nonnegative operands)
    mix = _hll_mix_sql(col)
    rows = df.select(g, F.expr(f"{mix} % {HLL_M}").alias("bucket"),
                     F.expr(_hll_rho_sql(mix)).alias("rho"))
    regs = rows.groupBy(group_col, "bucket").agg(F.max("rho").alias("r"))
    exact = (df.select(g, F.col(col)).distinct()
             .groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("exact_distinct")))
    agg = (regs.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("nb"),
                F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("zsum")))
    m = float(HLL_M)
    z = (m - F.col("nb")) + F.col("zsum")      # empty registers add 2^0
    raw = F.lit(HLL_ALPHA * m * m) / z
    v = m - F.col("nb")                        # zero-valued registers
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(m) * F.log(F.lit(m) / v)).otherwise(raw)
    return (agg.join(exact, group_col)
            .select(group_col, F.round(est, 4).alias("estimate"),
                    "exact_distinct"))


def hll_distinct_by_sql(table: str, group_col: str, col: str) -> str:
    """DuckDB twin of hll_distinct_by (same hash, same registers)."""
    h = _hll_mix_sql(col)
    m = float(HLL_M)
    return f"""
WITH rows_ AS (
    SELECT {group_col}, {h} % {HLL_M} AS bucket,
           {_hll_rho_sql(h)} AS rho
    FROM {table}
), regs AS (
    SELECT {group_col}, bucket, max(rho) AS r
    FROM rows_ GROUP BY 1, 2
), agg AS (
    SELECT {group_col}, count(*) AS nb,
           sum(power(2.0, -r)) AS zsum
    FROM regs GROUP BY 1
), ex AS (
    SELECT {group_col}, CAST(count(DISTINCT {col}) AS BIGINT)
           AS exact_distinct
    FROM {table} GROUP BY 1
)
SELECT agg.{group_col},
       round(CASE WHEN {HLL_ALPHA} * {m} * {m}
                       / (({m} - nb) + zsum) <= {2.5 * m}
                   AND ({m} - nb) > 0
                  THEN {m} * ln({m} / ({m} - nb))
                  ELSE {HLL_ALPHA} * {m} * {m} / (({m} - nb) + zsum)
             END, 4) AS estimate,
       ex.exact_distinct
FROM agg JOIN ex USING ({group_col})""".strip()


def kmv_set_ops(df_a: DataFrame, df_b: DataFrame, col: str,
                k: int = 256) -> DataFrame:
    """KMV sketch SET OPERATIONS (Beyer et al., SIGMOD'07): union /
    intersection / Jaccard estimates for two key sets from their
    mergeable bottom-k sketches — the estimator a 100-TB planner uses
    to size joins without scanning either side twice.

    The merged sketch is the bottom-k of the UNION of both hash sets;
    Jaccard_est = |{h in merged : h in A and h in B}| / |merged|, and
    intersect_est = Jaccard_est x union_est. Deterministic (same LCG
    hash as kmv_distinct), so the whole row is value-checkable; exact
    counts ride along to expose the sketch error.
    """
    ha = df_a.select(kmv_hash(F.col(col)).alias("h")).distinct()
    hb = df_b.select(kmv_hash(F.col(col)).alias("h")).distinct()
    merged = ha.unionAll(hb).distinct().orderBy("h").limit(k)
    flagged = (merged
               .join(ha.withColumn("in_a", F.lit(1)), "h", "left")
               .join(hb.withColumn("in_b", F.lit(1)), "h", "left"))
    sk = flagged.agg(
        F.count(F.lit(1)).alias("nb"),
        F.max("h").alias("hk"),
        F.sum((F.col("in_a").isNotNull()
               & F.col("in_b").isNotNull()).cast("long")).alias("both"))
    exact = (ha.withColumn("in_a", F.lit(1))
             .join(hb.withColumn("in_b", F.lit(1)), "h", "full")
             .agg(F.count(F.lit(1)).alias("exact_union"),
                  F.sum((F.col("in_a").isNotNull()
                         & F.col("in_b").isNotNull()).cast("long"))
                  .alias("exact_intersect")))
    union_est = F.when(F.col("nb") < k, F.col("nb").cast("double")) \
        .otherwise(F.lit(float(k - 1)) * F.lit(float(KMV_M))
                   / F.col("hk"))
    jac = F.col("both") / F.col("nb")
    return sk.crossJoin(exact).select(
        F.round(union_est, 4).alias("union_est"),
        F.round(jac * union_est, 4).alias("intersect_est"),
        F.round(jac, 6).alias("jaccard_est"),
        "exact_union", "exact_intersect")


def kmv_set_ops_sql(table_a: str, col_a: str, table_b: str,
                    col_b: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_set_ops` — same hash, same merge."""
    return f"""
WITH ha AS (
    SELECT DISTINCT ({KMV_A} * CAST({col_a} AS BIGINT) + {KMV_B})
           % {KMV_M} AS h FROM {table_a}
), hb AS (
    SELECT DISTINCT ({KMV_A} * CAST({col_b} AS BIGINT) + {KMV_B})
           % {KMV_M} AS h FROM {table_b}
), merged AS (
    SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
    ORDER BY h LIMIT {k}
), sk AS (
    SELECT count(*) AS nb, max(m.h) AS hk,
           sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
               THEN 1 ELSE 0 END) AS n_both
    FROM merged m LEFT JOIN ha a ON a.h = m.h
                  LEFT JOIN hb b ON b.h = m.h
), ex AS (
    SELECT count(*) AS exact_union,
           sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
               THEN 1 ELSE 0 END) AS exact_intersect
    FROM ha a FULL JOIN hb b ON a.h = b.h
)
SELECT round(CASE WHEN nb < {k} THEN CAST(nb AS DOUBLE)
             ELSE {k - 1} * {KMV_M}.0 / hk END, 4) AS union_est,
       round((n_both / CAST(nb AS DOUBLE))
             * CASE WHEN nb < {k} THEN CAST(nb AS DOUBLE)
               ELSE {k - 1} * {KMV_M}.0 / hk END, 4) AS intersect_est,
       round(n_both / CAST(nb AS DOUBLE), 6) AS jaccard_est,
       CAST(exact_union AS BIGINT) AS exact_union,
       CAST(exact_intersect AS BIGINT) AS exact_intersect
FROM sk CROSS JOIN ex
""".strip()
