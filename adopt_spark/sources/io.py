"""Typed sources and sinks.

The reference loads CSVs into typed column arrays with an explicit
schema and NULL token (``load <tbl> <csv> <sep> <null>``,
diskio/LoadCSV.java:35-90, console/SkinnerCmd.java:103-139) and
persists tables as serialized columns. The Spark equivalents:

  * read_csv  — schema'd CSV scan (never inferSchema in production:
    inference is a full extra pass over 100 TB).
  * read_json — schema'd JSON scan.
  * write_table / read_table — parquet with optional hash-bucketing
    columns baked into the layout (the engine's CSR-block tables are
    written this way so downstream joins/groupBys start co-located).

The reference's string-dictionary compression (compression/
Compressor.java) is parquet dictionary encoding — automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             sep: str = ",", null_value: str = "",
             header: bool = False) -> DataFrame:
    """Schema'd CSV load — the ``load tbl csv sep null`` analogue."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("nullValue", null_value)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_json(spark: SparkSession, path: str,
              schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_table(df: DataFrame, path: str, partition_cols: list[str] | None = None,
                num_files: int | None = None, mode: str = "overwrite") -> None:
    """Parquet sink; optional directory partitioning for pruning.

    ``partition_cols`` become directory partitions — scans filtered on
    them prune whole directories (the reference's index-filter
    fast-path, operators/IndexFilter.java, done at the storage layer).
    """
    w = df
    if num_files:
        w = w.repartition(num_files)
    writer = w.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
