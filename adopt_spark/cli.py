"""SQL script runner — the reference's console / benchmark entry point.

The reference ships a console (console/SkinnerCmd.java: parse a SQL
file or statement, execute, print) and a graph-benchmark driver
(benchmark/BenchAndVerify.java: load DB, loop over .sql files, print
count + per-phase timing). This module is the Spark equivalent: it
registers the engine's tables as temp views and executes ANSI-SQL
statements/files — including the reference's own graph_query/*.sql
suite verbatim, since those are plain multi-join COUNT queries over
the ``edge`` view.

Usage:
    python -m adopt_spark.cli <sql-file-or-statement> [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def register_edge_view(spark: SparkSession, sf_dir: str) -> None:
    from adopt_spark.edges import derived_edges
    derived_edges(spark, sf_dir).createOrReplaceTempView("edge")


def split_statements(sql_text: str) -> list[str]:
    return [s.strip() for s in sql_text.split(";") if s.strip()]


def run_sql(spark: SparkSession, sql_text: str,
            echo: bool = False, max_rows: int = 10_000) -> list[DataFrame]:
    """Execute every ;-separated statement; return result DataFrames.

    A console analogue must never pull an unbounded result to the
    driver: each statement collects at most ``max_rows`` rows (the
    limit is planned as CollectLimit, so oversized results stop early
    instead of flooding the driver).
    """
    out = []
    for stmt in split_statements(sql_text):
        t0 = time.time()
        df = spark.sql(stmt)
        # collect one extra row so an exactly-max_rows result is not
        # mislabeled as truncated
        rows = df.limit(max_rows + 1).collect()
        truncated = len(rows) > max_rows
        rows = rows[:max_rows]
        if echo:
            mark = " (truncated)" if truncated else ""
            print(f"-- {time.time() - t0:.3f}s  {len(rows)} row(s)"
                  f"{mark}  {stmt[:80]}...")
            for r in rows[:20]:
                print("  ", tuple(r))
        out.append(df)
    return out


def run_sql_file(spark: SparkSession, path: str, echo: bool = False) -> list[DataFrame]:
    with open(path) as f:
        return run_sql(spark, f.read(), echo=echo)


def explain_sql(spark: SparkSession, sql_text: str,
                echo: bool = False) -> list[str]:
    """Formatted physical plan per statement WITHOUT executing it —
    the analogue of the reference console's explain mode
    (SkinnerCmd explain/plot params threaded into QueryInfo,
    query/QueryInfo.java:49-66); here Catalyst's formatted explain
    shows the join strategy, pushed filters, and codegen stages the
    reference would print as its learned join order."""
    out = []
    for stmt in split_statements(sql_text):
        qe = spark.sql(stmt)._jdf.queryExecution()
        plan = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        out.append(plan)
        if echo:
            print(plan)
    return out


def repl(spark: SparkSession, sf_dir: str,
         input_fn=input, echo: bool = True) -> int:
    """Interactive console loop — parity with the reference console's
    command set (console/SkinnerCmd.java:302-340):

      quit            exit
      bench <file>    run a ;-separated SQL file with per-statement
                      timing (BenchAndVerify's loop)
      exec <file>     run a SQL file
      explain <sql>   formatted physical plan, no execution
      list            list registered tables/views
      load <tbl> <path>  register a parquet/CSV path as a view
                      (the console's `load` + `compress`/`index all`
                      are subsumed by parquet's dictionary encoding +
                      pushdown — documented no-ops here)
      compress / index all   no-op with a note (see above)
      help            this text
      <sql>           execute a SQL statement

    ``input_fn`` is injectable so tests can script a session.
    """
    n_err = 0
    while True:
        try:
            line = input_fn("adopt> ").strip()
        except EOFError:
            return n_err
        if not line:
            continue
        try:
            if line == "quit":
                return n_err
            elif line == "help":
                print(repl.__doc__)
            elif line == "list":
                for t in spark.catalog.listTables():
                    print(f"  {t.name}  ({t.tableType.lower()})")
            elif line in ("compress", "index all"):
                print("-- no-op: parquet dictionary encoding + predicate "
                      "pushdown subsume the reference's compress/index "
                      "steps (SURVEY.md §2.1)")
            elif line.startswith("bench ") or line.startswith("exec "):
                run_sql_file(spark, line.split(None, 1)[1], echo=echo)
            elif line.startswith("explain "):
                explain_sql(spark, line.split(None, 1)[1], echo=echo)
            elif line.startswith("load "):
                parts = line.split()
                if len(parts) != 3:
                    print("usage: load <table> <parquet-or-csv-path>")
                    continue
                _, tbl, path = parts
                if path.endswith(".csv"):
                    from adopt_spark.sources.io import read_csv
                    read_csv(spark, path).createOrReplaceTempView(tbl)
                else:
                    spark.read.parquet(path).createOrReplaceTempView(tbl)
                print(f"-- registered view {tbl}")
            else:
                run_sql(spark, line, echo=echo)
        except Exception as exc:  # noqa: BLE001 — console must survive
            n_err += 1
            print(f"error: {type(exc).__name__}: {exc}")


def main(argv: list[str] | None = None) -> int:
    from adopt_spark.session import get_spark

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sql", nargs="?", default=None,
                   help="SQL file path or literal statement "
                        "(omit with --interactive)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--edge-view", action="store_true",
                   help="also register the derived `edge` view")
    p.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan instead of "
                        "executing (the reference console's explain mode)")
    p.add_argument("--interactive", "-i", action="store_true",
                   help="console loop (the reference's SkinnerCmd REPL)")
    args = p.parse_args(argv)

    spark = get_spark("adopt_spark_cli")
    register_testdata(spark, args.sf_dir)
    if args.edge_view:
        register_edge_view(spark, args.sf_dir)
    if args.interactive or args.sql is None:
        return min(repl(spark, args.sf_dir), 1)
    try:
        with open(args.sql) as f:
            text = f.read()
    except OSError:
        text = args.sql
    if args.explain:
        explain_sql(spark, text, echo=True)
    else:
        run_sql(spark, text, echo=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
