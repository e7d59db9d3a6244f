"""Slowly-changing-dimension (SCD type 2) merge — CDC upsert as a join.

Warehouse-maintenance operator: given the CURRENT dimension snapshot
(one open row per key: ``valid_to IS NULL``) and a batch of updates
(key, new attribute value, effective date), produce the next snapshot:

* key absent from the batch, or attribute unchanged → row unchanged;
* attribute changed → the open row CLOSES (``valid_to`` = effective
  date) and a NEW open row appears (``valid_from`` = effective date);
* new key in the batch → a new open row.

This is Iceberg/Delta ``MERGE INTO`` semantics expressed as a plain
outer join + union — no MERGE DML needed, so it runs on any Spark and
shuffles each side exactly once on the key. History rows (already
closed) pass through untouched; at scale they live in separate
partitions (``valid_to IS NOT NULL``) and are never rewritten — the
job touches only the open slice plus the batch.

Determinism: one update per key per batch is required (the caller
pre-aggregates, e.g. latest-date / max-priority tie-break); equality
is NULL-safe (``<=>``) so NULL attributes do not churn rows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_merge(current: DataFrame, updates: DataFrame,
               key: str, attr: str,
               from_col: str = "valid_from", to_col: str = "valid_to",
               eff_col: str = "eff_date") -> DataFrame:
    """Apply one update batch to the OPEN slice of an SCD2 dimension.

    ``current``: [key, attr, valid_from, valid_to] with valid_to NULL
    (open rows only — pass the open slice, not history).
    ``updates``: [key, attr, eff_date], at most one row per key.
    Returns the new open+newly-closed rows: same schema as current.
    """
    cur = current.select(key, attr, from_col, to_col)
    upd = (updates.select(F.col(key), F.col(attr).alias("_new"),
                          F.col(eff_col).alias("_eff")))
    j = cur.join(upd, key, "full_outer")
    changed = (~F.col(attr).eqNullSafe(F.col("_new"))) & \
        F.col("_eff").isNotNull() & F.col(from_col).isNotNull()
    inserted = F.col(from_col).isNull()          # brand-new key
    # surviving open rows: unchanged keys keep their row verbatim
    keep = j.where(~changed & ~inserted).select(
        key, attr, from_col, to_col)
    # closed versions of changed rows
    closed = j.where(changed).select(
        key, attr, from_col, F.col("_eff").alias(to_col))
    # new open rows: changed keys + brand-new keys
    opened = j.where(changed | inserted).select(
        F.col(key), F.col("_new").alias(attr),
        F.col("_eff").alias(from_col),
        F.lit(None).cast(cur.schema[to_col].dataType).alias(to_col))
    return keep.unionByName(closed).unionByName(opened)


def scd2_merge_sql(current_sql: str, updates_sql: str,
                   key: str, attr: str,
                   from_col: str = "valid_from", to_col: str = "valid_to",
                   eff_col: str = "eff_date") -> str:
    """The identical merge for DuckDB."""
    return f"""WITH cur AS ({current_sql}), upd AS ({updates_sql}),
j AS (
    SELECT cur.{key} AS ck, cur.{attr} AS ca, cur.{from_col} AS vf,
           cur.{to_col} AS vt, upd.{key} AS uk, upd.{attr} AS ua,
           upd.{eff_col} AS eff
    FROM cur FULL OUTER JOIN upd ON cur.{key} = upd.{key}
)
SELECT ck AS {key}, ca AS {attr}, vf AS {from_col}, vt AS {to_col}
FROM j WHERE ck IS NOT NULL AND (eff IS NULL OR ca IS NOT DISTINCT FROM ua)
UNION ALL
SELECT ck, ca, vf, eff
FROM j WHERE ck IS NOT NULL AND eff IS NOT NULL
  AND ca IS DISTINCT FROM ua
UNION ALL
SELECT uk, ua, eff, NULL
FROM j WHERE eff IS NOT NULL AND (ck IS NULL OR ca IS DISTINCT FROM ua)"""
