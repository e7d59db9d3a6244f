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


def _py_chunks(text, chunk, stride):
    toks = text.split()
    if not toks:
        return []
    n = len(toks)
    nc = 1 if n <= chunk else -((n - chunk) // -stride) + 1
    return [(i, toks[i * stride:i * stride + chunk]) for i in range(nc)]


def test_chunk_documents_vs_python(spark):
    import numpy as np

    from adopt_spark.functions.export import chunk_documents

    rng = np.random.default_rng(3)
    rows = [(i, " ".join(f"w{int(rng.integers(0, 50))}"
                         for _ in range(int(rng.integers(0, 40)))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for chunk, stride in ((8, 8), (8, 5), (4, 1), (64, 48)):
        got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
               for r in chunk_documents(df, chunk, stride).collect()}
        want = {}
        for i, text in rows:
            for ci, toks in _py_chunks(text, chunk, stride):
                want[(i, ci)] = (len(toks), " ".join(toks))
        assert got == want, (chunk, stride)


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token of every doc appears in >= 1 chunk; consecutive
    chunks overlap by exactly chunk - stride tokens (except the
    tail)."""
    from adopt_spark.functions.export import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, 8, 6).collect(),
                  key=lambda r: r.chunk_idx)
    seen = []
    for r in rows:
        seen += r.chunk_text.split()
    assert set(seen) == {f"t{i}" for i in range(23)}
    for a, b in zip(rows, rows[1:]):
        overlap = set(a.chunk_text.split()) & set(b.chunk_text.split())
        assert len(overlap) == 2  # chunk 8 - stride 6


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from adopt_spark.functions.export import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, 0, 1)
    with _pytest.raises(ValueError):
        chunk_documents(df, 4, 0)


def test_reshard_plan_mass_and_movers(spark, docs):
    from adopt_spark.functions.export import (
        SHARD_A, SHARD_B, SHARD_M, reshard_plan, shard_plan)

    plan = reshard_plan(docs, 4, 6).collect()
    # mass preservation vs the single-shard totals
    base = shard_plan(docs, 1).collect()[0]
    assert sum(r.n_docs for r in plan) == base.n_docs
    assert sum(r.n_tokens for r in plan) == base.n_tokens
    # python replica of the assignment
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    from collections import Counter
    want = Counter()
    for i in ids:
        k = (SHARD_A * i + SHARD_B) % SHARD_M
        want[(k % 4, k % 6)] += 1
    assert {(r.old_shard, r.new_shard): r.n_docs for r in plan} == dict(want)
    # moved flag is exactly the off-diagonal
    assert all(r.moved == (r.old_shard != r.new_shard) for r in plan)


def test_reshard_plan_identity_when_same_count(spark, docs):
    from adopt_spark.functions.export import reshard_plan

    plan = reshard_plan(docs, 8, 8).collect()
    assert all(not r.moved for r in plan)
    assert all(r.old_shard == r.new_shard for r in plan)
