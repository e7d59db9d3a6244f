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


def mv_merge(base: DataFrame, delta: DataFrame, keys: list[str],
             qty_col: str, price_col: str) -> DataFrame:
    """Incremental materialized-view maintenance (insert-only).

    ``base`` and ``delta`` are raw fact slices; the view is the
    per-``keys`` aggregate {n_rows, sum_qty, min_price, max_price,
    avg_qty}. Instead of recomputing over base ∪ delta, each side is
    reduced to its PARTIAL STATE (count/sum/min/max — the classic
    commutative-monoid decomposition every incremental-view engine
    uses) and the two state tables are merged by one aggregation over
    their union: counts and sums add, mins take min, maxes take max,
    avg is re-derived from the merged sum/count. At 10^12-row scale
    the merge shuffles only O(#groups) state rows — the base slice is
    never re-scanned.

    Scale shape: two map-side-combined aggregations (one per slice;
    in production the base state is the stored view, so zero base
    work) + one O(#groups) merge aggregation. No reference
    counterpart (ADOPT re-runs the query); Iceberg/Materialize-style
    new-engine surface.
    """
    def state(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(qty_col).cast("double")).alias("sum_qty"),
            F.min(F.col(price_col).cast("double")).alias("min_price"),
            F.max(F.col(price_col).cast("double")).alias("max_price"),
        )

    merged = (state(base).unionByName(state(delta))
              .groupBy(*keys).agg(
                  F.sum("n_rows").alias("n_rows"),
                  F.sum("sum_qty").alias("sum_qty"),
                  F.min("min_price").alias("min_price"),
                  F.max("max_price").alias("max_price")))
    return merged.select(
        *keys,
        "n_rows",
        F.round("sum_qty", 4).alias("sum_qty"),
        F.round("min_price", 4).alias("min_price"),
        F.round("max_price", 4).alias("max_price"),
        F.round(F.col("sum_qty") / F.col("n_rows"), 6).alias("avg_qty"))


def mv_merge_oracle_sql(table: str, keys: list[str], qty_col: str,
                        price_col: str) -> str:
    """The oracle IS the full recompute — the strongest possible check
    for an incremental merge: state decomposition + merge must equal
    a from-scratch aggregate over the whole fact table."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks},
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(CAST({qty_col} AS DOUBLE)), 4) AS sum_qty,
       round(min(CAST({price_col} AS DOUBLE)), 4) AS min_price,
       round(max(CAST({price_col} AS DOUBLE)), 4) AS max_price,
       round(sum(CAST({qty_col} AS DOUBLE)) / count(*), 6) AS avg_qty
FROM {table} GROUP BY {ks}
""".strip()


def file_skipping_stats(df: DataFrame, part_col: str, order_col: str,
                        pred_col: str, lo: str, hi: str,
                        rows_per_file: int = 1000) -> DataFrame:
    """Iceberg manifest-pruning effectiveness -> one row per
    (part, layout): n_files, files_read, files_skipped, rows_matched,
    false-positive files (min/max overlap the predicate but hold zero
    matching rows), and the scanned-row count.

    Rows are packed into synthetic data files of ``rows_per_file``
    under two layouts — 'clustered' (file assignment follows
    ``pred_col``, the Z-order-style friendly case) and 'unclustered'
    (assignment follows ``order_col``, the ingest-order case) — then
    a planner prunes on per-file min/max of ``pred_col`` for the
    range [lo, hi], exactly what an Iceberg reader does with manifest
    column stats. The gap between the two layouts' skip ratios is the
    measured value of clustering the table.

    Scale shape: per (part, layout) one window row_number (an Iceberg
    partition's file list is task-sized; for degenerate partitions
    range-partition the sort) + one per-file aggregate + one summary
    aggregate. Pure Column algebra, oracle-checkable value-for-value.
    """
    out = []
    for layout, key in (("clustered", pred_col), ("unclustered", order_col)):
        per_file = (df.select(F.col(part_col).alias("part"),
                              F.col(order_col).alias("o"),
                              F.col(pred_col).alias("p"))
                    .withColumn("file_id",
                                ((F.row_number().over(
                                    Window.partitionBy("part")
                                    .orderBy(F.col("p" if key == pred_col
                                                   else "o"), "o", "p"))
                                  - 1) / F.lit(rows_per_file))
                                .cast("long"))
                    .groupBy("part", "file_id")
                    .agg(F.min("p").alias("mn"), F.max("p").alias("mx"),
                         F.count(F.lit(1)).alias("n"),
                         F.sum(F.when((F.col("p") >= F.lit(lo))
                                      & (F.col("p") <= F.lit(hi)), 1)
                               .otherwise(0)).alias("hits")))
        read = (F.col("mx") >= F.lit(lo)) & (F.col("mn") <= F.lit(hi))
        out.append(per_file.groupBy("part").agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(read.cast("long")).alias("files_read"),
            F.sum((~read).cast("long")).alias("files_skipped"),
            F.sum((read & (F.col("hits") == 0)).cast("long"))
             .alias("files_false_positive"),
            F.sum(F.when(read, F.col("n")).otherwise(0))
             .alias("rows_scanned"),
            F.sum("hits").alias("rows_matched")))
    r = out[0].unionByName(out[1])
    return r.select("part", "layout", "n_files", "files_read",
                    "files_skipped", "files_false_positive",
                    "rows_scanned", "rows_matched")


def file_skipping_sql(table: str, part_col: str, order_col: str,
                      pred_col: str, lo: str, hi: str,
                      rows_per_file: int = 1000) -> str:
    """DuckDB twin of :func:`file_skipping_stats`."""
    def one(layout: str, key: str) -> str:
        return f"""
SELECT part, '{layout}' AS layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN mx >= '{lo}' AND mn <= '{hi}' THEN 1 ELSE 0 END)
            AS BIGINT) AS files_read,
       CAST(sum(CASE WHEN mx >= '{lo}' AND mn <= '{hi}' THEN 0 ELSE 1 END)
            AS BIGINT) AS files_skipped,
       CAST(sum(CASE WHEN mx >= '{lo}' AND mn <= '{hi}' AND hits = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS files_false_positive,
       CAST(sum(CASE WHEN mx >= '{lo}' AND mn <= '{hi}' THEN n ELSE 0 END)
            AS BIGINT) AS rows_scanned,
       CAST(sum(hits) AS BIGINT) AS rows_matched
FROM (
    SELECT part, file_id, min(p) AS mn, max(p) AS mx,
           count(*) AS n,
           sum(CASE WHEN p >= '{lo}' AND p <= '{hi}' THEN 1 ELSE 0 END)
               AS hits
    FROM (
        SELECT {part_col} AS part, {order_col} AS o, {pred_col} AS p,
               CAST((row_number() OVER (PARTITION BY {part_col}
                         ORDER BY {key}) - 1)
                    // {rows_per_file} AS BIGINT) AS file_id
        FROM {table}
    ) GROUP BY part, file_id
) GROUP BY part"""
    # sort keys must match the Spark window exactly (order_col is
    # unique, so both orders are total and deterministic on both
    # engines); raw column names — DuckDB window specs cannot always
    # see same-SELECT aliases
    a = one("clustered", f"{pred_col}, {order_col}")
    b = one("unclustered", f"{order_col}")
    return f"{a}\nUNION ALL\n{b}".strip()
