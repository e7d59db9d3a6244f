"""Entity resolution: block → match → cluster → canonicalize.

The composed dedup pipeline every catalog/record-linkage job runs:

1. **Block + match**: PassJoin edit-distance self-join over the
   distinct-name dictionary (functions/editdist.py) — bounded-key
   candidates, exact levenshtein verify.
2. **Cluster**: connected components over the match-pair graph
   (algos/cc.py hash-min — exact, parallelism-independent) after
   mapping names to dense ids with a window-ranked dictionary (the
   dictionary is vocabulary-sized; at 100 TB swap the window for a
   zipWithIndex-style two-phase rank, same contract).
3. **Canonicalize**: every name maps to the lexicographically
   smallest name of its cluster; singletons map to themselves.

Output is the resolution table (name → canonical) a downstream join
applies to the raw corpus. All stages are this engine's own
oracle-checked operators; the DuckDB twin re-derives the closure with
a recursive CTE over the brute-force match pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from adopt_spark.algos.cc import connected_components
from adopt_spark.functions.editdist import edit_distance_join


def resolve_entities(strings: DataFrame, col: str,
                     max_dist: int = 2) -> DataFrame:
    """Returns DataFrame[name string, canonical string]: one row per
    distinct non-null value of ``col``, canonical = min name reachable
    through edit-distance-<=max_dist matches."""
    spark = strings.sparkSession
    dic = (strings.select(F.col(col).cast("string").alias("name"))
           .where(F.col("name").isNotNull()).distinct())
    ids = dic.withColumn(
        "id", F.row_number().over(Window.orderBy("name")).cast("long"))
    pairs = edit_distance_join(strings, col, max_dist)
    e = (pairs
         .join(ids.select(F.col("name").alias("na"),
                          F.col("id").alias("sid")), "na")
         .join(ids.select(F.col("name").alias("nb"),
                          F.col("id").alias("tid")), "nb")
         .select("sid", "tid"))
    labels, _ = connected_components(spark, e)
    # component label -> canonical name (min name == min id by the
    # ORDER BY name ranking, so the component's min id IS the min name)
    canon = labels.join(ids.select(F.col("id").alias("component"),
                                   F.col("name").alias("canonical")),
                        "component").select(
        F.col("v").alias("id"), "canonical")
    return (ids.join(canon, "id", "left")
            .select("name",
                    F.coalesce("canonical", "name").alias("canonical")))


def resolve_entities_sql(table_sql: str, col: str,
                         max_dist: int = 2) -> str:
    """Recursive-closure twin for DuckDB: min reachable name over the
    brute-force match-pair graph (dictionary-sized input only)."""
    return f"""WITH RECURSIVE dic AS MATERIALIZED (
    SELECT DISTINCT CAST({col} AS VARCHAR) AS name FROM ({table_sql})
    WHERE {col} IS NOT NULL
), pairs AS MATERIALIZED (
    SELECT a.name AS x, b.name AS y
    FROM dic a JOIN dic b
      ON a.name <> b.name
     AND abs(length(a.name) - length(b.name)) <= {max_dist}
     AND levenshtein(a.name, b.name) <= {max_dist}
), reach(x, y) AS (
    SELECT name AS x, name AS y FROM dic
    UNION
    SELECT r.x, p.y FROM reach r JOIN pairs p ON p.x = r.y
)
SELECT x AS name, min(y) AS canonical FROM reach GROUP BY x"""
