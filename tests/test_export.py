"""Training-export sharding: DuckDB twin, determinism, balance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.export import (
    SHARD_M, shard_plan, shard_plan_sql, sharded_docs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_shard_plan_matches_duckdb(spark, docs):
    got = {r.shard: (r.n_docs, r.n_tokens, r.n_bytes, r.min_okey,
                     r.max_okey, int(r.key_checksum))
           for r in shard_plan(docs, 16).collect()}
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    exp = {r[0]: (r[1], r[2], r[3], r[4], r[5], int(r[6]))
           for r in con.execute(shard_plan_sql(16)).fetchall()}
    assert got == exp


def test_shard_totals_and_balance(spark, docs):
    n = docs.count()
    plan = shard_plan(docs, 16).collect()
    assert sum(r.n_docs for r in plan) == n
    assert len(plan) == 16  # every shard non-empty at 100+ docs
    sizes = [r.n_docs for r in plan]
    assert max(sizes) <= 3 * min(sizes)  # LCG keys spread evenly


def test_okey_is_injective_and_partition_invariant(spark, docs):
    s1 = sharded_docs(docs.repartition(1), 8)
    s7 = sharded_docs(docs.repartition(7), 8)
    rows1 = sorted((r.doc_id, r.okey, r.shard)
                   for r in s1.select("doc_id", "okey", "shard").collect())
    rows7 = sorted((r.doc_id, r.okey, r.shard)
                   for r in s7.select("doc_id", "okey", "shard").collect())
    assert rows1 == rows7
    okeys = [o for _, o, _ in rows1]
    assert len(set(okeys)) == len(okeys)  # LCG bijection: no collisions
    assert all(0 <= o < SHARD_M for o in okeys)
    assert all(s == o % 8 for _, o, s in rows1)


def test_degenerates(spark, docs):
    one = shard_plan(docs, 1).collect()
    assert len(one) == 1 and one[0].n_docs == docs.count()
    with pytest.raises(ValueError, match="n_shards"):
        sharded_docs(docs, 0)
    empty = docs.limit(0)
    assert shard_plan(empty, 4).count() == 0
    # empty text counts 0 tokens, not 1
    e = shard_plan(
        docs.sparkSession.createDataFrame([(1, "  "), (2, "a b")],
                                          "doc_id long, text string"), 1
    ).collect()[0]
    assert e.n_tokens == 2
