"""Skew helpers: salted aggregation equals plain aggregation."""

import pytest
from pyspark.sql import functions as F

from adopt_spark.skew import hub_vertices, salted_group_sum


def test_salted_group_sum_matches_plain(spark):
    df = spark.range(100_000).select(
        (F.col("id") % 7).alias("k"),         # 7 hot keys
        (F.col("id") * 0.5).alias("x"))
    plain = {r["k"]: r["s"] for r in
             df.groupBy("k").agg(F.sum("x").alias("s")).collect()}
    salted = {r["k"]: r["total"] for r in
              salted_group_sum(df, "k", "x", "total", salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_hub_vertices(spark):
    deg = spark.createDataFrame([(1, 500), (2, 3), (3, 10_000)], "v long, deg long")
    hubs = {r["v"] for r in hub_vertices(deg, threshold=100).collect()}
    assert hubs == {1, 3}
