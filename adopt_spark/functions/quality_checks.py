"""Declarative data-quality constraint suite (the Deequ/dbt-test shape).

A 100-TB ingest pipeline gates every batch on a constraint report:
completeness, uniqueness, accepted values, ranges, format, referential
integrity. This module evaluates a declarative constraint list in as
few passes as the constraint mix allows:

  * all row-local constraints (``not_null`` / ``accepted_values`` /
    ``range`` / ``regex``) compile to conditional-sum aggregate
    expressions evaluated in ONE scan of the table — the classic
    metrics-computation fusion (Schelter et al., "Automating
    Large-Scale Data Quality Verification", VLDB 2018);
  * each ``unique`` constraint adds one count-distinct to the same
    aggregation (Spark rewrites it as an expand + two-phase agg —
    still the one scan);
  * each ``fk`` constraint is one left-anti join against the
    referenced key column (broadcast when the dim is small).

The report is one row per constraint: (constraint, kind,
n_violations, passed). NULL handling follows the usual contract:
``not_null`` counts NULLs, every other row-local kind skips NULLs
(a NULL fails completeness, not format).

Reference parity: no ADOPT counterpart (new-engine pipeline surface);
oracle = the same conditional aggregates in ANSI SQL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

# constraint forms:
#   ("not_null", col)
#   ("unique", col)
#   ("accepted_values", col, [v1, v2, ...])
#   ("range", col, lo, hi)
#   ("regex", col, pattern)          # pattern must be Spark+RE2-safe
#   ("fk", col, ref_df, ref_col)


def _name(c: tuple) -> str:
    return f"{c[0]}:{c[1]}"


def dq_report(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """-> DataFrame[constraint, kind, n_violations, passed]."""
    aggs, order = [], []
    fk_parts = []
    n_total = F.count(F.lit(1))
    for c in constraints:
        kind, col = c[0], c[1]
        nm = _name(c)
        x = F.col(col)
        if kind == "not_null":
            aggs.append(F.sum(F.when(x.isNull(), 1).otherwise(0))
                        .cast("long").alias(nm))
        elif kind == "unique":
            aggs.append((F.sum(F.when(x.isNotNull(), 1).otherwise(0))
                         - F.countDistinct(x)).cast("long").alias(nm))
        elif kind == "accepted_values":
            aggs.append(F.sum(F.when(x.isNotNull() & ~x.isin(list(c[2])),
                                     1).otherwise(0))
                        .cast("long").alias(nm))
        elif kind == "range":
            lo, hi = c[2], c[3]
            aggs.append(F.sum(F.when(x.isNotNull()
                                     & ((x < F.lit(lo)) | (x > F.lit(hi))),
                                     1).otherwise(0))
                        .cast("long").alias(nm))
        elif kind == "regex":
            aggs.append(F.sum(F.when(x.isNotNull() & ~x.rlike(c[2]), 1)
                              .otherwise(0)).cast("long").alias(nm))
        elif kind == "fk":
            ref_df, ref_col = c[2], c[3]
            miss = (df.select(x.alias("__k")).where(F.col("__k").isNotNull())
                    .join(ref_df.select(F.col(ref_col).alias("__k"))
                          .distinct(), "__k", "left_anti")
                    .agg(F.count(F.lit(1)).cast("long").alias("n"))
                    .select(F.lit(nm).alias("constraint"),
                            F.lit(kind).alias("kind"),
                            F.col("n").alias("n_violations")))
            fk_parts.append(miss)
            continue
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        order.append((nm, kind))

    parts = []
    if order:
        one = df.agg(*aggs)
        stack = ", ".join(f"'{nm}', '{kd}', `{nm}`" for nm, kd in order)
        parts.append(one.select(F.expr(
            f"stack({len(order)}, {stack})"
            f" as (constraint, kind, n_violations)")))
    parts.extend(fk_parts)
    rep = reduce(DataFrame.unionAll, parts)
    nv = F.coalesce(F.col("n_violations"), F.lit(0)).cast("long")
    return rep.select("constraint", "kind", nv.alias("n_violations"),
                      (nv == 0).alias("passed"))


def dq_report_sql(table: str, constraints: list[tuple]) -> str:
    """DuckDB twin; ``fk`` constraints take (kind, col, ref_table,
    ref_col) with a TABLE NAME in slot 2."""
    parts = []
    for c in constraints:
        kind, col = c[0], c[1]
        nm = _name(c)
        if kind == "not_null":
            v = f"sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
        elif kind == "unique":
            v = (f"sum(CASE WHEN {col} IS NOT NULL THEN 1 ELSE 0 END)"
                 f" - count(DISTINCT {col})")
        elif kind == "accepted_values":
            vals = ", ".join(f"'{x}'" if isinstance(x, str) else str(x)
                             for x in c[2])
            v = (f"sum(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({vals})"
                 f" THEN 1 ELSE 0 END)")
        elif kind == "range":
            v = (f"sum(CASE WHEN {col} IS NOT NULL AND ({col} < {c[2]}"
                 f" OR {col} > {c[3]}) THEN 1 ELSE 0 END)")
        elif kind == "regex":
            v = (f"sum(CASE WHEN {col} IS NOT NULL AND NOT "
                 f"regexp_matches({col}, '{c[2]}') THEN 1 ELSE 0 END)")
        elif kind == "fk":
            ref_table, ref_col = c[2], c[3]
            parts.append(f"""
SELECT '{nm}' AS constraint, 'fk' AS kind,
       CAST(count(*) AS BIGINT) AS n_violations,
       count(*) = 0 AS passed
FROM {table} t
WHERE t.{col} IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM {ref_table} r
                  WHERE r.{ref_col} = t.{col})""".strip())
            continue
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        parts.append(f"""
SELECT '{nm}' AS constraint, '{kind}' AS kind,
       CAST(coalesce({v}, 0) AS BIGINT) AS n_violations,
       coalesce({v}, 0) = 0 AS passed
FROM {table}""".strip())
    return "\nUNION ALL\n".join(parts)
