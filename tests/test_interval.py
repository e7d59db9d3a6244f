"""As-of and band joins vs DuckDB (native ASOF JOIN / plain theta)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

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


def _random_asof_frames(spark, n_left=400, n_right=300, skew_key=None):
    """Random (key, t, payload) frames; skew_key concentrates 90% of
    rows on one key."""
    rng = np.random.default_rng(99)
    def keys(n):
        if skew_key is None:
            return rng.integers(0, 8, n)
        return np.where(rng.uniform(size=n) < 0.9, skew_key,
                        rng.integers(0, 8, n))
    lt = rng.integers(0, 10_000, n_left)
    rt = rng.integers(0, 10_000, n_right)
    ldf = spark.createDataFrame(
        [(int(i), int(k), int(t)) for i, (k, t) in enumerate(zip(keys(n_left), lt))],
        "lid long, k long, t long")
    # right unique per (k, t): dedup keeping max rid
    seen = {}
    for i, (k, t) in enumerate(zip(keys(n_right), rt)):
        seen[(int(k), int(t))] = i
    rdf = spark.createDataFrame(
        [(k, t, int(rid)) for (k, t), rid in seen.items()],
        "k long, t long, rid long")
    return ldf, rdf


@pytest.mark.parametrize("skew_key", [None, 3])
@pytest.mark.parametrize("width", [1, 100, 1000, 50_000])
def test_asof_bucketed_matches_plain(spark, skew_key, width):
    """The time-bucketed plan must be semantics-identical to the
    single-window asof_join — including buckets with no right rows,
    carry across many empty buckets (width=1), one-bucket degeneration
    (width=50k > range), and a 90%-skew monster key."""
    from adopt_spark.functions.interval import asof_join_bucketed

    ldf, rdf = _random_asof_frames(spark, skew_key=skew_key)
    plain = {(r["lid"],): r["r_rid"] for r in
             asof_join(ldf, rdf, on="t", by=["k"], right_cols=["rid"]).collect()}
    buck = {(r["lid"],): r["r_rid"] for r in
            asof_join_bucketed(ldf, rdf, on="t", by=["k"], right_cols=["rid"],
                               bucket_width=width).collect()}
    assert buck == plain


def test_asof_bucketed_timestamp_on_column(spark):
    from adopt_spark.functions.interval import asof_join_bucketed

    ldf = spark.createDataFrame(
        [(1, 0, "2024-01-01 10:30:00"), (2, 0, "2024-01-01 09:00:00")],
        "lid long, k long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    rdf = spark.createDataFrame(
        [(0, "2024-01-01 10:30:00", 7), (0, "2024-01-01 08:00:00", 5)],
        "k long, ts string, rid long").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["lid"]: r["r_rid"] for r in
           asof_join_bucketed(ldf, rdf, on="ts", by=["k"], right_cols=["rid"],
                              bucket_width=3600).collect()}
    assert out == {1: 7, 2: 5}   # inclusive <= at 10:30; 09:00 -> 08:00 row


def test_asof_bucketed_rejects_bad_width(spark):
    from adopt_spark.functions.interval import asof_join_bucketed

    ldf = spark.createDataFrame([(1, 0, 5)], "lid long, k long, t long")
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join_bucketed(ldf, ldf, on="t", by=["k"], right_cols=["lid"],
                           bucket_width=0)


def test_interval_overlap_join_vs_python(spark):
    from adopt_spark.functions.interval import interval_overlap_join

    import itertools
    import numpy as np

    rng = np.random.default_rng(5)
    L = [(i, int(s), int(s + rng.integers(0, 500)))
         for i, s in enumerate(rng.integers(0, 5000, 60))]
    R = [(i, int(s), int(s + rng.integers(0, 500)))
         for i, s in enumerate(rng.integers(0, 5000, 60))]
    ldf = spark.createDataFrame(L, "lid long, s long, e long")
    rdf = spark.createDataFrame(R, "rid long, s long, e long")
    for bucket in (1, 97, 300, 10_000):   # incl. degenerate bucket sizes
        got = {(r.lid, r.rid) for r in
               interval_overlap_join(ldf, rdf, "s", "e", "s", "e",
                                     bucket=bucket).collect()}
        want = {(a, b) for (a, ls, le), (b, rs, re)
                in itertools.product(L, R)
                if ls <= re and rs <= le}
        assert got == want, bucket
    # exactly-once: collect() (not a set) has no duplicate pairs
    rows = interval_overlap_join(ldf, rdf, bucket=97).collect()
    pairs = [(r.lid, r.rid) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_interval_overlap_join_rejects_bad_bucket(spark):
    from adopt_spark.functions.interval import interval_overlap_join

    df = spark.createDataFrame([(1, 0, 10)], "i long, s long, e long")
    import pytest
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, bucket=0)


def test_sessionize_batch_vs_python(spark):
    from adopt_spark.functions.interval import sessionize_batch

    import datetime as dt

    def T(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    # user 1: [0, 100, 2000] -> sessions {0,100} and {2000};
    # user 2: single event; user 3: equal timestamps tie-broken by id
    rows = [(0, T(0), 1), (1, T(100), 1), (2, T(2000), 1),
            (3, T(50), 2),
            (4, T(10), 3), (5, T(10), 3), (6, T(5000), 3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {(r.user_id, r.session_idx): (r.s_start, r.s_end, r.n_events)
           for r in sessionize_batch(df, gap_seconds=1800).collect()}
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got == {
        (1, 1): (base + 0, base + 100, 2),
        (1, 2): (base + 2000, base + 2000, 1),
        (2, 1): (base + 50, base + 50, 1),
        (3, 1): (base + 10, base + 10, 2),
        (3, 2): (base + 5000, base + 5000, 1),
    }
    # matches the streaming sessionizer's single-batch gap semantics:
    # events exactly `gap` apart stay in one session (strict >)
    rows2 = [(0, T(0), 9), (1, T(1800), 9), (2, T(3601), 9)]
    df2 = spark.createDataFrame(rows2, "event_id long, ts timestamp, user_id long")
    got2 = sessionize_batch(df2, gap_seconds=1800).collect()
    assert {(r.session_idx, r.n_events) for r in got2} == {(1, 2), (2, 1)}


def test_asof_tolerance_masks_stale_matches(spark):
    from adopt_spark.functions.interval import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 250), (3, "k", 1000)],
        "id long, k string, t long")
    right = spark.createDataFrame(
        [("k", 90, 9.0), ("k", 240, 24.0)],
        "k string, t long, px double")
    out = {r.id: r.r_px for r in
           asof_join(left, right, on="t", by=["k"],
                     right_cols=["px"], tolerance=50).collect()}
    # id=1: view at 90, age 10 <= 50 -> match; id=2: 240, age 10;
    # id=3: latest right is 240, age 760 > 50 -> masked NULL
    assert out == {1: 9.0, 2: 24.0, 3: None}
    # without tolerance id=3 keeps the stale match
    out2 = {r.id: r.r_px for r in
            asof_join(left, right, on="t", by=["k"],
                      right_cols=["px"]).collect()}
    assert out2[3] == 24.0


def test_asof_tolerance_validation(spark):
    import pytest as _pytest

    from adopt_spark.functions.interval import asof_join

    df = spark.createDataFrame([(1, "k", 1)], "id long, k string, t long")
    with _pytest.raises(ValueError):
        asof_join(df, df, on="t", by=["k"], right_cols=["id"],
                  tolerance=-1)


def test_asof_forward_hand_case(spark):
    """Forward as-of on a tiny timeline: next view at-or-after each
    click, NULL when none follows."""
    from unittest import mock

    import pandas as pd

    from adopt_spark.queries import registry as R

    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base + pd.Timedelta(seconds=10), 7, "click", 0.0),
        (2, base + pd.Timedelta(seconds=30), 7, "view", 0.0),
        (3, base + pd.Timedelta(seconds=40), 7, "click", 0.0),
        (4, base + pd.Timedelta(seconds=40), 7, "view", 0.0),
        (5, base + pd.Timedelta(seconds=99), 7, "click", 0.0),
    ]
    df = spark.createDataFrame(
        [(i, t.to_pydatetime(), u, et, v) for i, t, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = {r.event_id: (r.next_view_id, r.wait_s)
               for r in R.q_asof_forward(spark, "x").collect()}
    assert got[1] == (2, 20.0)        # next view 20s later
    assert got[3] == (4, 0.0)         # same-instant view matches
    assert got[5] == (None, None)     # nothing follows
