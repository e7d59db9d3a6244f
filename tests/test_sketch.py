"""KMV distinct sketch: exact regime, estimate determinism, accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.sketch import (
    KMV_A, KMV_B, KMV_M, kmv_distinct, kmv_distinct_sql,
)


def test_exact_below_k(spark):
    df = spark.range(100).select((F.col("id") * 37).alias("x"))
    row = kmv_distinct(df, "x", k=256).collect()[0]
    assert row["estimate"] == 100.0
    assert row["exact_distinct"] == 100


def test_duplicates_collapse(spark):
    df = spark.range(10_000).select((F.col("id") % 50).alias("x"))
    row = kmv_distinct(df, "x", k=64).collect()[0]
    assert row["estimate"] == 50.0 and row["exact_distinct"] == 50


def test_estimate_matches_python_and_is_within_bounds(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("x"))
    k = 256
    row = kmv_distinct(df, "x", k=k).collect()[0]
    hashes = sorted({(KMV_A * x + KMV_B) % KMV_M for x in range(n)})
    hk = hashes[k - 1]
    expect = round((k - 1) * KMV_M / hk, 4)
    assert row["estimate"] == pytest.approx(expect)
    assert row["exact_distinct"] == n
    # KMV standard error ~ 1/sqrt(k) ≈ 6.3%; allow 4 sigma
    assert abs(row["estimate"] - n) / n < 0.25


def test_sql_twin_matches_spark(spark, tmp_path):
    import duckdb

    n = 5_000
    df = spark.range(n).select((F.col("id") * 13 % 3001).alias("x"))
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    got = kmv_distinct(spark.read.parquet(p), "x", k=128).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    oc = con.execute(kmv_distinct_sql("t", "x", k=128)).fetchone()
    assert (got["estimate"], got["exact_distinct"]) == (oc[0], oc[1])
