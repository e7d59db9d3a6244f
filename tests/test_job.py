"""JOB/IMDB workload slice (queries/job.py): Spark vs DuckDB on the
identical synthesized tables, plus law sanity checks."""

import duckdb
import pytest

from adopt_spark.queries.job import (
    IMDB_TABLES, JOB_QUERIES, job_oracle_sql, job_query,
    register_imdb_views,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "part", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMALL}/{t}.parquet')")
    yield con
    con.close()


def test_all_21_tables_present():
    assert len(IMDB_TABLES) == 21
    for t in ("title", "cast_info", "movie_companies", "movie_info",
              "movie_info_idx", "movie_keyword", "keyword", "name",
              "char_name", "company_name", "company_type", "info_type",
              "kind_type", "role_type", "link_type", "movie_link",
              "aka_name", "aka_title", "person_info", "complete_cast",
              "comp_cast_type"):
        assert t in IMDB_TABLES, t


def test_table_row_counts_match_duckdb(spark, duck):
    register_imdb_views(spark, SF_SMALL)
    for t in ("title", "movie_companies", "cast_info", "movie_keyword",
              "company_name", "keyword", "movie_link", "complete_cast"):
        n_spark = spark.table(t).count()
        n_duck = duck.execute(
            f"WITH {t} AS ({IMDB_TABLES[t]}) SELECT count(*) FROM {t}"
        ).fetchone()[0]
        assert n_spark == n_duck > 0, t


@pytest.mark.parametrize("name", sorted(JOB_QUERIES))
def test_job_query_matches_duckdb(spark, duck, name):
    got = job_query(name)(spark, SF_SMALL).collect()[0].asDict()
    want = duck.execute(job_oracle_sql(name)).fetchdf().iloc[0].to_dict()
    assert set(got) == set(want), name
    for col in got:
        gv, wv = got[col], want[col]
        assert (gv is None) == (wv is None or wv != wv), (name, col, gv, wv)
        if gv is not None:
            assert str(gv) == str(wv), (name, col, gv, wv)


def test_queries_are_nonempty_at_sf001(duck):
    """Every query must produce a non-all-NULL MIN row at the gate
    scale — an all-NULL row would make the oracle comparison
    vacuous."""
    for name in JOB_QUERIES:
        df = duck.execute(job_oracle_sql(name)).fetchdf()
        assert len(df) == 1
        assert not df.isna().all(axis=None), name


def test_job_plans_broadcast_dims_no_cartesian(spark):
    """Design-for-scale: the tiny dimension tables (info_type,
    company_type, kind_type, ...) must enter as broadcast joins, and
    no query may plan a cartesian product (JOB's join graphs are
    connected)."""
    register_imdb_views(spark, SF_SMALL)
    for name in ("job_1a", "job_13a", "job_25a", "job_32a"):
        plan = (spark.sql(JOB_QUERIES[name])
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
