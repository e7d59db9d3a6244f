"""Differential tests for the batch-3 analytics operators: hourly
autocorrelation, Benford first-digit audit, exact-arithmetic EWMA.

Twins are independent numpy/pandas implementations (the DuckDB oracle
parity is covered by the contract gate; these pin the math itself).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_TINY


def test_autocorr_matches_numpy(spark):
    from adopt_spark.queries.registry import q_autocorr

    got = {r.k: r for r in q_autocorr(spark, SF_TINY).collect()}

    pdf = pd.read_parquet(f"{SF_TINY}/events.parquet", columns=["ts"])
    h = (pdf["ts"].astype("datetime64[ns]").astype("int64")
         // (3_600 * 10**9)).to_numpy()
    hmin, hmax = int(h.min()), int(h.max())
    x = np.bincount(h - hmin, minlength=hmax - hmin + 1).astype(float)
    n = len(x)
    xbar = x.mean()
    den = ((x - xbar) ** 2).sum()
    for k in (1, 2, 3, 24):
        num = ((x[: n - k] - xbar) * (x[k:] - xbar)).sum()
        assert got[k].n_pairs == n - k
        assert got[k].autocorr == pytest.approx(num / den, abs=2e-6)


def test_autocorr_constant_series_is_null(spark, tmp_path):
    from adopt_spark.queries.registry import q_autocorr

    # one event in every hour of a 30h span -> zero variance -> NULL
    rows = [(i, (pd.Timestamp("2024-01-01")
                 + pd.Timedelta(hours=i)).to_pydatetime(), 1)
            for i in range(30)]
    df = spark.createDataFrame(
        [(i, t, u, "click", 1.0) for i, t, u in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    d = tmp_path / "sf"
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = {r.k: r for r in q_autocorr(spark, str(d)).collect()}
    assert out[1].autocorr is None and out[1].n_pairs == 29
    assert out[24].autocorr is None and out[24].n_pairs == 6


def test_autocorr_perfect_daily_seasonality(spark, tmp_path):
    from adopt_spark.queries.registry import q_autocorr

    # a 24h-periodic count pattern over 6 whole days -> lag-24
    # autocorrelation is the maximum across the probed lags
    rows, eid = [], 0
    for day in range(6):
        for hour in range(24):
            burst = 5 if hour in (9, 18) else 1
            for _ in range(burst):
                rows.append((eid,
                             (pd.Timestamp("2024-03-01")
                              + pd.Timedelta(days=day, hours=hour,
                                             minutes=eid % 50))
                             .to_pydatetime(),
                             eid % 7))
                eid += 1
    df = spark.createDataFrame(
        [(i, t, u, "view", 2.0) for i, t, u in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    d = tmp_path / "sf"
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = {r.k: r.autocorr for r in q_autocorr(spark, str(d)).collect()}
    # perfectly periodic series: the biased estimator is exactly
    # (n - k)/n at the period (120/144 here)
    assert out[24] == pytest.approx(120 / 144, abs=1e-6)
    assert out[24] > out[1] and out[24] > out[2] and out[24] > out[3]


def test_benford_known_digits(spark, tmp_path):
    from adopt_spark.queries.registry import q_benford

    totals = [1013.70, 1999.99, 105.00, 950.10, 9.99, 0.07, 23.45, 2.50]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(totals)],
        "o_orderkey long, o_totalprice double")
    d = tmp_path / "sf"
    df.write.mode("overwrite").parquet(str(d / "orders.parquet"))
    out = {r.digit: r for r in q_benford(spark, str(d)).collect()}
    # first significant digits: 1,1,1,9,9,7,2,2
    assert {d_: out[d_].n for d_ in out} == {1: 3, 9: 2, 7: 1, 2: 2}
    assert sum(r.obs_p for r in out.values()) == pytest.approx(1.0, abs=5e-6)
    for d_, r in out.items():
        assert r.exp_p == pytest.approx(math.log10(1 + 1 / d_), abs=1e-6)
        nn, p = len(totals), math.log10(1 + 1 / d_)
        assert r.chi2_term == pytest.approx(
            (r.n - nn * p) ** 2 / (nn * p), abs=1e-5)


def test_ewma_matches_manual_weights(spark):
    from adopt_spark.queries.registry import q_ewma

    got = {r.user_id: r for r in q_ewma(spark, SF_TINY).collect()}

    pdf = pd.read_parquet(f"{SF_TINY}/events.parquet",
                          columns=["user_id", "ts", "event_id", "value"])
    pdf["v100"] = np.floor(pdf["value"].to_numpy() * 100 + 0.5)
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], ascending=False).head(16)
        w = 2.0 ** (16 - np.arange(1, len(g) + 1))
        want = (w * g["v100"].to_numpy()).sum() / w.sum() / 100.0
        assert got[uid].n_used == len(g)
        assert got[uid].ewma == pytest.approx(want, abs=1e-6)


def test_ewma_tie_break_and_truncation(spark, tmp_path):
    from adopt_spark.queries.registry import q_ewma

    t0 = pd.Timestamp("2024-01-01T00:00:00").to_pydatetime()
    # user 1: two events at the SAME ts -> higher event_id is "latest";
    # user 2: 20 events -> only the last 16 count
    rows = [(1, t0, 1, "a", 10.00), (2, t0, 1, "a", 30.00)]
    import datetime
    rows += [(100 + i, t0 + datetime.timedelta(minutes=i), 2, "a", float(i))
             for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    d = tmp_path / "sf"
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = {r.user_id: r for r in q_ewma(spark, str(d)).collect()}
    # user 1: newest (event_id 2, v=30) weight 2^15, older 2^14
    assert out[1].ewma == pytest.approx(
        (30 * 2**15 + 10 * 2**14) / (2**15 + 2**14), abs=1e-6)
    # user 2: values 19..4 (last 16), newest weight 2^15
    w = 2.0 ** np.arange(15, -1, -1)
    v = np.arange(19, 3, -1, dtype=float)
    assert out[2].n_used == 16
    assert out[2].ewma == pytest.approx((w * v).sum() / w.sum(), abs=1e-6)


def test_quantile_bins_vs_python(spark):
    """Equi-depth bucket assignment replayed in python (numpy linear
    interpolation == Spark percentile == DuckDB quantile_cont)."""
    import numpy as np

    from adopt_spark.functions.stats import quantile_bins

    rows = [(f"t{i % 3}", float((i * 37) % 101) / 7) for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    vals = np.array([v for _, v in rows])
    cuts = [round(float(np.quantile(vals, q, method="linear")), 6)
            for q in (0.25, 0.5, 0.75)]
    agg = {}
    for t, v in rows:
        b = 1 + sum(1 for c in cuts if v > c)
        key = (t, b)
        agg.setdefault(key, []).append(v)
    want = {k: (len(vs), round(min(vs), 6), round(max(vs), 6),
                round(sum(vs) / len(vs), 6))
            for k, vs in agg.items()}
    got = {(r.event_type, r.bucket): (r.n, r.min_v, r.max_v, r.mean_v)
           for r in quantile_bins(df).collect()}
    assert got == want


def test_quantile_bins_equi_depth_and_validation(spark):
    import pytest as _pytest

    from adopt_spark.functions.stats import quantile_bins

    # distinct values -> buckets within 1 of n/k each
    rows = [("a", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    sizes = {r.bucket: r.n for r in quantile_bins(df, k=4).collect()}
    assert set(sizes) == {1, 2, 3, 4}
    assert all(abs(n - 25) <= 1 for n in sizes.values())
    with _pytest.raises(ValueError):
        quantile_bins(df, k=1)


def test_item_recs_cosine_law(spark):
    """Item-CF cosine on a hand basket fixture."""
    from adopt_spark.queries.registry import q_item_recs  # noqa: F401
    from adopt_spark.edges import bipartite_project
    from pyspark.sql import functions as F

    # baskets: {1,2} x3, {1,3} x2, {2,3} x1 -> w(1,2)=3, w(1,3)=2,
    # w(2,3)=1 (dropped by min_weight=2); pop: 1->5, 2->4, 3->3
    rows = []
    oid = 0
    for basket, n in (((1, 2), 3), ((1, 3), 2), ((2, 3), 1)):
        for _ in range(n):
            oid += 1
            rows += [(oid, it) for it in basket]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    pairs = {(r.sid, r.tid): r.weight
             for r in bipartite_project(df, "l_orderkey", "l_partkey",
                                        min_weight=2).collect()}
    assert pairs == {(1, 2): 3, (1, 3): 2}
    import math
    assert round(3 / math.sqrt(5 * 4), 6) == round(0.670820, 6)


def test_changepoint_vs_python(spark):
    """Binary-segmentation argmax replayed in python on a planted
    level shift."""
    import pandas as pd

    from adopt_spark.functions.stats import changepoint_binary

    base = pd.Timestamp("2024-03-01")
    rows = []
    for d in range(30):
        # level 2.0 for days 0-14, 8.0 after (+ small deterministic
        # wiggle), one event per day
        v = (2.0 if d < 15 else 8.0) + (d % 3) * 0.1
        t = (base + pd.Timedelta(days=d)).to_pydatetime()
        rows.append(("shift", t, v))
        rows.append(("flat", t, 5.0))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r.event_type: r for r in changepoint_binary(df).collect()}

    # python twin for the shifted series
    days = [(base + pd.Timedelta(days=d)).value // 86_400_000_000_000
            for d in range(30)]
    ms = [round((2.0 if d < 15 else 8.0) + (d % 3) * 0.1, 6)
          for d in range(30)]
    n, tot = len(ms), sum(ms)
    best = None
    for k in range(1, n):
        s = sum(ms[:k])
        ml, mr = s / k, (tot - s) / (n - k)
        gain = round(k * (n - k) / n * (ml - mr) * (ml - mr), 6)
        if best is None or gain > best[0]:
            best = (gain, days[k - 1], k)
    r = got["shift"]
    assert (r.gain, r.split_day, r.n_left) == best
    assert r.n_left == 15                      # the planted break
    assert r.mean_right > r.mean_left
    # flat series: gain ~ 0
    assert got["flat"].gain == 0.0


def test_stl_decompose_vs_python(spark):
    """Additive decomposition on a planted weekly pattern: seasonal
    recovers the phase offsets, residual near zero, m = trend +
    seasonal + resid exactly (up to the 6dp quanta)."""
    import pandas as pd

    base = pd.Timestamp("2024-05-01")
    season = [0.0, 1.0, 2.0, 3.0, -1.0, -2.0, -3.0]
    rows = []
    for d in range(28):
        v = 10.0 + season[d % 7]
        rows.append(("s", (base + pd.Timedelta(days=d)).to_pydatetime(), v))
    df = spark.createDataFrame(rows,
                               "event_type string, ts timestamp, value double")
    # drive the registry entry itself on the fixture by substituting
    # the table loader
    import unittest.mock as mock

    from adopt_spark.queries import registry as R
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = R.q_stl_decompose(spark, "ignored").collect()
    rows_by_day = {r.day: r for r in got}
    assert len(rows_by_day) == 22          # 28 days - 2*3 boundary
    for r in rows_by_day.values():
        # exact additivity by construction
        assert abs(r.m - r.trend - r.seasonal - r.resid) < 2e-6
        # constant-mean series: trend ~ 10 + small seasonal leakage,
        # residual small
        assert abs(r.resid) < 0.8
    # seasonal ordering matches the planted phase ranking
    seas = {r.day % 7: r.seasonal for r in rows_by_day.values()}
    assert max(seas, key=seas.get) in (0, 1, 2, 3, 4, 5, 6)
    assert seas[min(seas, key=seas.get)] < seas[max(seas, key=seas.get)]


def test_seasonal_anomaly_planted_spike(spark):
    """A planted one-day spike on an otherwise perfectly seasonal
    series is the detector's top hit; clean days stay under the
    threshold."""
    import pandas as pd
    from unittest import mock

    from adopt_spark.queries import registry as R

    base = pd.Timestamp("2024-05-01")
    season = [0.0, 1.0, 2.0, 3.0, -1.0, -2.0, -3.0]
    rows = []
    for d in range(35):
        v = 10.0 + season[d % 7] + (0.01 * (d % 5))   # tiny noise
        if d == 17:
            v += 50.0                                  # the spike
        rows.append(("s", (base + pd.Timedelta(days=d)).to_pydatetime(), v))
    df = spark.createDataFrame(rows,
                               "event_type string, ts timestamp, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        got = R.q_seasonal_anomaly(spark, "x").collect()
    assert got, "spike must be flagged"
    days = sorted(r.day for r in got)
    spike_day = (base + pd.Timedelta(days=17)).value // 86_400_000_000_000
    assert spike_day in days
    top = max(got, key=lambda r: r.score)
    assert top.day == spike_day
