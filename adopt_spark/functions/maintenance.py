"""Table-maintenance planners: compaction bin-packing + partition skew.

The north-rule input is an Iceberg catalog of source-code repositories
at 10^12-file scale; at that size the engine's job is not only to
query files but to keep the table healthy. Two planners, both pure
Column algebra (exact BIGINT arithmetic, no Python, no collect):

``compaction_plan``
    The standard small-file compaction strategy (Iceberg's binpack):
    within each table partition, walk the files in a deterministic
    order and cut a new output bin every time the running byte total
    crosses ``target_bytes``. Expressed as ONE window cumsum — the
    bin id of a file is ``floor(exclusive_running_bytes / target)``,
    so files are never reordered, bins are contiguous runs, and every
    bin but the last per partition ends at-or-just-past the target.
    Scale shape: a single hash-partitioned window per table partition
    (the per-partition file list sorts in one task — Iceberg
    partitions hold ~10^3-10^5 files, far under task memory; for a
    degenerate million-file partition, range-partition the sort the
    same way r_window_rank does) followed by one hash aggregation.

``partition_skew``
    Answers "if I hash-partition this table by KEY into P buckets,
    how unbalanced do the buckets come out?" — the planning query
    behind every explicit-repartition decision in this repo. The
    bucket id uses the repo's shared multiplicative hash (exact in
    BIGINT, identical in Spark and DuckDB — functions/sketch.py), so
    the report is oracle-checkable value-for-value; Spark's own
    ``pmod(hash(k), P)`` assigns real buckets the same way but is not
    replicable outside the JVM. One aggregation, P output rows.

Reference parity: no ADOPT counterpart (ADOPT queries a fixed
in-memory table); this is new-engine surface for the 10^12-file
catalog the north rule targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from adopt_spark.functions.sketch import KMV_A, KMV_B, KMV_M


def compaction_plan(files: DataFrame, part_col: str, file_col: str,
                    bytes_col: str, target_bytes: int) -> DataFrame:
    """Plan -> (part, bin, n_files, bin_bytes, first_file, last_file).

    Deterministic greedy binpack per table partition: files in
    ``file_col`` order, a file starts a new bin when the bytes before
    it reach the next multiple of ``target_bytes``.
    """
    w = (Window.partitionBy("part").orderBy("file_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    planned = files.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file_id"),
        F.col(bytes_col).cast("long").alias("bytes"),
    ).withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("bytes").over(w), F.lit(0))
                / F.lit(int(target_bytes))).cast("long"))
    return (planned.groupBy("part", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file")))


def compaction_plan_sql(table: str, part_col: str, file_col: str,
                        bytes_col: str, target_bytes: int) -> str:
    """DuckDB twin of :func:`compaction_plan`."""
    return f"""
WITH planned AS (
    SELECT {part_col} AS part,
           {file_col} AS file_id,
           CAST({bytes_col} AS BIGINT) AS bytes,
           CAST(floor(coalesce(sum(CAST({bytes_col} AS BIGINT)) OVER (
                    PARTITION BY {part_col} ORDER BY {file_col}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / {int(target_bytes)}) AS BIGINT) AS bin
    FROM {table}
)
SELECT part, bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       min(file_id) AS first_file,
       max(file_id) AS last_file
FROM planned GROUP BY 1, 2
""".strip()


def partition_skew(df: DataFrame, key_col: str,
                   num_partitions: int = 32) -> DataFrame:
    """Skew report -> (partition_id, n_rows, n_keys, load_factor).

    ``load_factor`` is this bucket's row count over the perfectly
    balanced share (n_rows * P / total, one double division of exact
    BIGINTs, rounded 6 dp) — 1.0 means balanced, the max over rows is
    the straggler multiplier an explicit repartition would inherit.
    """
    pid = F.pmod(
        F.pmod(F.lit(KMV_A) * F.col(key_col).cast("long") + F.lit(KMV_B),
               F.lit(KMV_M)),
        F.lit(int(num_partitions)))
    per = df.select(pid.alias("partition_id"),
                    F.col(key_col).alias("k")).groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("k").alias("n_keys"))
    tot = per.agg(F.sum("n_rows").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "partition_id", "n_rows", "n_keys",
        F.round((F.col("n_rows") * F.lit(int(num_partitions)))
                .cast("double") / F.col("total"), 6).alias("load_factor"))


def partition_skew_sql(table: str, key_col: str,
                       num_partitions: int = 32) -> str:
    """DuckDB twin of :func:`partition_skew` (same shared hash)."""
    return f"""
WITH per AS (
    SELECT (({KMV_A} * CAST({key_col} AS BIGINT) + {KMV_B}) % {KMV_M})
               % {int(num_partitions)} AS partition_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT {key_col}) AS BIGINT) AS n_keys
    FROM {table} GROUP BY 1
), tot AS (SELECT sum(n_rows) AS total FROM per)
SELECT partition_id, n_rows, n_keys,
       round(CAST(n_rows * {int(num_partitions)} AS DOUBLE) / total,
             6) AS load_factor
FROM per CROSS JOIN tot
""".strip()
