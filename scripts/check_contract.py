"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() in DuckDB at
the given sf dir, compares row count, column-name set, and an
order-insensitive value comparison (rows sorted by all columns, column
order normalized by name). Prints one line per query + a summary.

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    for c in out.columns:
        if out[c].dtype == object:
            continue
        if str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64").round(9)
        else:
            try:
                out[c] = out[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                pass
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if set(spark_pdf.columns) != set(duck_pdf.columns):
        problems.append(f"schema: spark={sorted(spark_pdf.columns)} "
                        f"duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                av64 = av.astype("float64")
                bv64 = bv.astype("float64")
                bad = ~((av64.isna() & bv64.isna())
                        | ((av64 - bv64).abs() <= 1e-9 + 1e-9 * bv64.abs()))
                if bad.any():
                    i = bad.idxmax()
                    problems.append(f"values[{c}]: {av64[i]} != {bv64[i]} at {i}")
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    neq = av.astype(str) != bv.astype(str)
                    i = neq.idxmax()
                    problems.append(f"values[{c}]: {av[i]!r} != {bv[i]!r} at {i}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from adopt_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("contract_check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sdf)} rows match oracle")
    print(f"\n{len(failures)} failures / {len([n for n in qs if not only or n in only])} queries")
    if failures:
        print("failed:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
