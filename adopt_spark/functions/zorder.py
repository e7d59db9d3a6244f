"""Z-order (Morton) clustering for multi-dimensional data skipping.

Storage-layout operator for the 100-TB scan path: parquet/Iceberg
row-group pruning works off per-file min/max column stats, which a
single-column sort only concentrates for ONE predicate column.
Interleaving the bits of two (or more) low-cardinality-bounded keys
into a Morton code and range-partitioning + sorting by it gives every
file a tight bounding box in BOTH dimensions, so selective predicates
on either column prune files/row-groups (the same layout Iceberg's
``zorder`` table maintenance and Delta OPTIMIZE ZORDER BY produce).

The code itself is pure JVM Column arithmetic (shift/mask/sum over
``bits`` positions — whole-stage-codegen fodder, no UDF), identical
integer-for-integer in any ANSI SQL engine, which is what the DuckDB
twin checks. ``zorder_layout`` is the write path:
``repartitionByRange`` on the code (range exchange with sampled
bounds) + ``sortWithinPartitions`` so each output file owns one
contiguous Z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Values must
    fit in ``bits`` bits (mask applied; callers bucket first)."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The bit-identical expression for DuckDB/ANSI SQL."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(df: DataFrame, x: str, y: str, path: str,
                  n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` clustered by the Morton code of (x, y): range
    exchange on the code, sorted within partitions, one Z-contiguous
    parquet file per partition."""
    z = morton_code(x, y, bits).alias("_z")
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))
