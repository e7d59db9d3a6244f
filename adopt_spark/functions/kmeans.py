"""Deterministic fixed-iteration Lloyd's k-means over embeddings.

Training-data curation workhorse (cluster-then-sample / cluster-level
dedup à la SemDeDup): partition an embedding column into k clusters
with plain Lloyd's iterations, made fully deterministic so a SQL twin
can replay it value-for-value:

  * init: the k vectors with the smallest ids (no RNG);
  * assignment: argmin SQUARED EUCLIDEAN distance, ties broken by
    smaller centroid id (row_number on (dist, cid) in the oracle);
  * update: per-dimension mean of the assigned vectors;
  * fixed iteration count (no convergence test), mirroring the
    unrolled-superstep oracle pattern (queries/oracle_gen.py).

Plan shape / scale: each iteration is
  (1) a BROADCAST of the k centroid rows (k is small by definition)
      cross-joined against the corpus — no shuffle;
  (2) distance = one JVM higher-order fold (zip_with + aggregate)
      over the arrays — whole-stage codegen, no Python;
  (3) per-point argmin via min_by struct comparison — map-side only;
  (4) centroid update: posexplode to (cid, dim, x) and one
      hash-aggregated avg keyed on (cid, dim) — the only shuffle,
      k·dim output rows.
The corpus is never collected; only the k×dim centroid table passes
through the driver-free broadcast exchange each round. At 100 TB this
is the canonical distributed k-means loop.

Float caveat (documented, shared with the knn oracles): sums fold in
index order on both engines; cross-engine drift is ≤1e-12, far below
any realistic argmin margin. Output is integer (vec_id, cid), so the
contract hash carries no float formatting at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KMEANS_K = 8
KMEANS_ITERS = 4


def kmeans_assign(emb: DataFrame, k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Cluster assignment after ``iters`` Lloyd rounds.

    Returns DataFrame[<id_col> , cid int].
    """
    pts = emb.select(F.col(id_col).alias("pid"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("v"))
    # TakeOrdered (per-partition heaps) pulls the k seed rows; the
    # single-task window then only ever sees k rows
    seeds = pts.orderBy("pid").limit(k)
    cents = (seeds.withColumn("rk", F.row_number().over(Window.orderBy("pid")))
             .select((F.col("rk") - 1).cast("int").alias("cid"),
                     F.col("v").alias("c")))

    def assign(cents_df: DataFrame) -> DataFrame:
        d = (pts.crossJoin(F.broadcast(cents_df))
             .select(
                 "pid", "v", "cid",
                 F.aggregate(
                     F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, x: acc + x).alias("dist")))
        return (d.groupBy("pid")
                .agg(F.min(F.struct("dist", "cid")).alias("best"),
                     F.first("v").alias("v"))
                .select("pid", "v", F.col("best.cid").alias("cid")))

    for _ in range(iters):
        a = assign(cents)
        cents = (a.select("cid", F.posexplode("v").alias("i", "x"))
                 .groupBy("cid", "i").agg(F.avg("x").alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(
                     F.collect_list(F.struct("i", "m"))).alias("im"))
                 .select("cid",
                         F.transform("im", lambda s: s["m"]).alias("c")))
    return (assign(cents)
            .select(F.col("pid").alias(id_col), F.col("cid").cast("int")))


def kmeans_assign_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """DuckDB twin: identical init / argmin tie-break / update chain."""
    ctes = [f"""ex AS (
    SELECT {id_col} AS pid, generate_subscripts({vec_col}, 1) AS i,
           CAST(unnest({vec_col}) AS DOUBLE) AS x
    FROM {table}
)""", f"""ids AS (
    SELECT pid, row_number() OVER (ORDER BY pid) - 1 AS cid
    FROM (SELECT DISTINCT pid FROM ex) ORDER BY pid LIMIT {k}
)""", """c0 AS (
    SELECT ids.cid, ex.i, ex.x AS m FROM ex JOIN ids USING (pid)
)"""]
    for t in range(1, iters + 1):
        prev, cur = f"c{t - 1}", f"c{t}"
        ctes.append(f"""d{t} AS (
    SELECT ex.pid, c.cid, sum((ex.x - c.m) * (ex.x - c.m)) AS dist
    FROM ex JOIN {prev} c USING (i) GROUP BY ex.pid, c.cid
)""")
        ctes.append(f"""a{t} AS (
    SELECT pid, cid FROM (
        SELECT pid, cid,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY dist, cid) AS rk
        FROM d{t}) WHERE rk = 1
)""")
        ctes.append(f"""{cur} AS (
    SELECT a.cid, ex.i, avg(ex.x) AS m
    FROM ex JOIN a{t} a USING (pid) GROUP BY a.cid, ex.i
)""")
    final = iters + 1
    ctes.append(f"""d{final} AS (
    SELECT ex.pid, c.cid, sum((ex.x - c.m) * (ex.x - c.m)) AS dist
    FROM ex JOIN c{iters} c USING (i) GROUP BY ex.pid, c.cid
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT pid AS {id_col}, CAST(cid AS INTEGER) AS cid FROM (
    SELECT pid, cid,
           row_number() OVER (PARTITION BY pid ORDER BY dist, cid) AS rk
    FROM d{final}) WHERE rk = 1""")
