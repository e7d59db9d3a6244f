"""As-of and band joins vs DuckDB (native ASOF JOIN / plain theta)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from adopt_spark.functions.interval import asof_join, band_join


def _random_frames(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(60),
        "k": rng.integers(0, 5, 60),
        "t": rng.integers(0, 40, 60).astype("int64"),
    })
    right = (pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "t": rng.integers(0, 40, 40).astype("int64"),
        "rid": np.arange(40),
    }).groupby(["k", "t"], as_index=False).agg(rid=("rid", "max")))
    return left, right


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_asof_join_vs_duckdb(spark, seed):
    left, right = _random_frames(seed)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    expected = {tuple(row) for row in con.execute("""
        SELECT l.lid, l.k, l.t, r.rid
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.t <= l.t
    """).fetchall()}
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = asof_join(ldf, rdf, on="t", by=["k"], right_cols=["rid"])
    got = {(r["lid"], r["k"], r["t"], r["r_rid"]) for r in out.collect()}
    assert got == expected


def test_asof_equal_timestamp_is_inclusive(spark):
    ldf = spark.createDataFrame([(1, 0, 10)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(0, 10, 99), (0, 9, 50)],
                                "k long, t long, rid long")
    out = asof_join(ldf, rdf, on="t", by=["k"], right_cols=["rid"]).collect()
    assert out[0]["r_rid"] == 99          # the equal-ts right row wins


def test_asof_no_preceding_row_yields_null(spark):
    ldf = spark.createDataFrame([(1, 0, 5)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(0, 6, 1)], "k long, t long, rid long")
    out = asof_join(ldf, rdf, on="t", by=["k"], right_cols=["rid"]).collect()
    assert out[0]["r_rid"] is None


@pytest.mark.parametrize("band", [0.5, 3.0, 10.0])
def test_band_join_vs_bruteforce(spark, band):
    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(0, 50, 80), 3)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "id long, v double")
    out = band_join(df, df, "v", "v", band=band)
    got = {(r["l_id"], r["r_id"]) for r in
           out.where("l_id < r_id").collect()}
    expected = {(i, j) for i in range(80) for j in range(i + 1, 80)
                if abs(vals[i] - vals[j]) <= band}
    assert got == expected


def test_asof_null_right_fields_not_resurrected(spark):
    """The latest right ROW wins atomically: a NULL field in it must
    NOT be backfilled from an older right row."""
    ldf = spark.createDataFrame([(1, 0, 3)], "lid long, k long, t long")
    rdf = spark.createDataFrame(
        [(0, 1, 5, 7), (0, 2, 9, None)],
        "k long, t long, a long, b long")
    out = asof_join(ldf, rdf, on="t", by=["k"], right_cols=["a", "b"]).collect()
    assert out[0]["r_a"] == 9 and out[0]["r_b"] is None


@pytest.mark.parametrize("band", [0.0, -1.0])
def test_band_join_rejects_nonpositive_band(spark, band):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="band > 0"):
        band_join(df, df, "v", "v", band=band)
