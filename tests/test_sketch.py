"""KMV distinct sketch: exact regime, estimate determinism, accuracy."""

from __future__ import annotations

import os

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


def test_grouped_kmv_matches_python_and_sql(spark, tmp_path):
    import duckdb
    from adopt_spark.functions.sketch import kmv_distinct_by, kmv_distinct_by_sql

    df = spark.range(30_000).selectExpr("id % 3 AS g", "(id * 17) % 9001 AS x")
    p = str(tmp_path / "g.parquet")
    df.write.parquet(p)
    got = {r["g"]: (r["estimate"], r["exact_distinct"])
           for r in kmv_distinct_by(spark.read.parquet(p), "g", "x", k=128)
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    oc = {r[0]: (r[1], r[2]) for r in
          con.execute(kmv_distinct_by_sql("t", "g", "x", k=128)).fetchall()}
    assert got == oc
    # python replica for one group
    vals = {(i * 17) % 9001 for i in range(30_000) if i % 3 == 0}
    hs = sorted({(KMV_A * v + KMV_B) % KMV_M for v in vals})
    if len(hs) >= 128:
        expect = round(127 * KMV_M / hs[127], 4)
    else:
        expect = float(len(hs))
    assert got[0] == (pytest.approx(expect), len(vals))


def test_grouped_kmv_small_groups_exact(spark):
    from adopt_spark.functions.sketch import kmv_distinct_by

    df = spark.range(1000).selectExpr("id % 4 AS g", "id % 20 AS x")
    rows = kmv_distinct_by(df, "g", "x", k=64).collect()
    for r in rows:
        assert r["estimate"] == float(r["exact_distinct"]) == 5.0


def test_streaming_kmv_single_and_multi_batch_match_batch(spark, tmp_path):
    """The mergeable-sketch identity: streaming fold (1 file, or 3
    micro-batches) equals batch KMV per window, value-for-value."""
    import numpy as np
    import pandas as pd

    from adopt_spark.functions.sketch import KMV_A, KMV_B, KMV_M
    from adopt_spark.streaming.sketch_stream import windowed_distinct_kmv_stream

    rng = np.random.default_rng(11)
    n = 3000
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 4 * 3600, n), unit="s")
    df = pd.DataFrame({"ts": ts, "user_id": rng.integers(0, 500, n)})
    df = df.sort_values("ts").reset_index(drop=True)
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, part in enumerate(np.array_split(df, 3)):
        out_part = part.drop(columns=["w"], errors="ignore").copy()
        out_part["ts"] = out_part["ts"].astype("datetime64[us]")
        out_part.to_parquet(str(src / f"f{i}.parquet"))
        os.utime(str(src / f"f{i}.parquet"), (1000 + i, 1000 + i))

    # python batch oracle per hour window
    k = 32
    expect = {}
    df["w"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
    for w, grp in df.groupby("w"):
        hs = sorted({(KMV_A * int(u) + KMV_B) % KMV_M
                     for u in grp["user_id"]})
        expect[w] = (float(len(hs)) if len(hs) < k
                     else round((k - 1) * KMV_M / hs[k - 1], 4))

    for trigger in (None, 1):
        out = windowed_distinct_kmv_stream(
            spark, None, k=k, source_dir=str(src),
            max_files_per_trigger=trigger)
        got = {r["window_start"]: r["estimate"] for r in out.collect()}
        assert got == expect, f"trigger={trigger}"




def test_count_min_overestimates_and_matches_duckdb(spark):
    """CMS point estimates: always >= true count; exact when no
    collision; Spark == DuckDB bit-for-bit (shared-hash)."""
    import duckdb

    from adopt_spark.functions.sketch import (
        count_min_estimates, count_min_estimates_sql,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {(r.key, r.est, r.n_true)
           for r in count_min_estimates(ev, "user_id").collect()}
    assert all(est >= n for _, est, n in got)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf}/events.parquet'")
    exp = {tuple(r) for r in
           con.execute(count_min_estimates_sql("events", "user_id"))
              .fetchall()}
    assert got == exp


# ------------------------------------------------------------- HLL


def test_hll_error_bound_and_exact(spark):
    from adopt_spark.functions.sketch import hll_distinct_by

    # two groups: one big (HLL branch), one tiny (linear counting)
    rows = [("big", i % 5000) for i in range(20000)] + \
           [("small", i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r for r in hll_distinct_by(df, "g", "x").collect()}
    assert got["big"].exact_distinct == 5000
    assert got["small"].exact_distinct == 7
    # m=64 registers -> standard error 1.04/8 = 13%; allow 3 sigma
    assert abs(got["big"].estimate - 5000) / 5000 < 0.4
    # small group goes through linear counting: near-exact
    assert abs(got["small"].estimate - 7) < 3


def test_hll_duckdb_twin_bit_equal(spark, tmp_path):
    import duckdb

    from adopt_spark.functions.sketch import (hll_distinct_by,
                                              hll_distinct_by_sql)

    rows = [(f"g{i % 3}", (i * 17) % 1000) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, x long")
    p = f"{tmp_path}/t.parquet"
    df.write.parquet(p)
    got = sorted(map(tuple, hll_distinct_by(
        spark.read.parquet(p), "g", "x").collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = sorted(map(tuple,
                      con.execute(hll_distinct_by_sql("t", "g", "x"))
                      .fetchall()))
    assert got == want


def test_kmv_set_ops_python_differential(spark):
    from adopt_spark.functions.sketch import (
        KMV_A, KMV_B, KMV_M, kmv_set_ops,
    )

    A = list(range(0, 3000, 2))       # evens
    B = list(range(0, 3000, 3))       # multiples of 3
    da = spark.createDataFrame([(v,) for v in A], "key long")
    db = spark.createDataFrame([(v,) for v in B], "key long")
    k = 128
    row = kmv_set_ops(da, db, "key", k=k).collect()[0]

    h = lambda v: (KMV_A * v + KMV_B) % KMV_M  # noqa: E731
    ha, hb = {h(v) for v in A}, {h(v) for v in B}
    merged = sorted(ha | hb)[:k]
    nb, hk = len(merged), max(merged)
    both = sum(1 for x in merged if x in ha and x in hb)
    union_est = nb if nb < k else (k - 1) * KMV_M / hk
    assert row.exact_union == len(ha | hb)
    assert row.exact_intersect == len(ha & hb)
    assert row.union_est == pytest.approx(round(union_est, 4))
    assert row.jaccard_est == pytest.approx(round(both / nb, 6))
    assert row.intersect_est == pytest.approx(
        round(both / nb * union_est, 4))
    # the estimates are actually in the neighborhood of the truth
    assert row.union_est == pytest.approx(row.exact_union, rel=0.25)
    assert row.intersect_est == pytest.approx(row.exact_intersect,
                                              rel=0.4)


def test_kmv_set_ops_below_k_is_exact(spark):
    from adopt_spark.functions.sketch import kmv_set_ops

    da = spark.createDataFrame([(v,) for v in range(20)], "key long")
    db = spark.createDataFrame([(v,) for v in range(10, 30)], "key long")
    row = kmv_set_ops(da, db, "key", k=256).collect()[0]
    assert row.union_est == 30.0
    assert row.exact_union == 30 and row.exact_intersect == 10
    assert row.intersect_est == pytest.approx(10.0)
