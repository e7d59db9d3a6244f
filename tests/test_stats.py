"""Differential tests for the statistics layer (functions/stats.py).

Pure-numpy twins (the image has no scipy): each test recomputes the
statistic from the raw sample with an independent rank/ECDF
implementation and compares to 6 dp, plus partition invariance on the
heavier operators (the window-over-collapsed-counts shape must not
depend on input partitioning).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from adopt_spark.functions.stats import (
    cusum_drift, km_survival, ks_2sample, mann_whitney_u, spearman_corr,
    welch_ttest,
)
from pyspark.sql import functions as F


def _two_group_df(spark, x1, x2, parts=1):
    rows = [("a", float(v)) for v in x1] + [("b", float(v)) for v in x2]
    return spark.createDataFrame(rows, "g string, v double") \
        .repartition(parts)


def _avg_ranks(pooled: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties, numpy-only."""
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(7)
    # quantized to force ties across and within groups
    x1 = np.round(rng.normal(50, 10, 400), 1)
    x2 = np.round(rng.normal(52, 12, 300), 1)
    return x1, x2


@pytest.mark.parametrize("parts", [1, 7])
def test_ks_matches_numpy(spark, samples, parts):
    x1, x2 = samples
    out = ks_2sample(_two_group_df(spark, x1, x2, parts),
                     "g", "v", "a", "b").collect()[0]
    grid = np.unique(np.concatenate([x1, x2]))
    f1 = np.searchsorted(np.sort(x1), grid, side="right") / len(x1)
    f2 = np.searchsorted(np.sort(x2), grid, side="right") / len(x2)
    d_ref = np.max(np.abs(f1 - f2))
    assert out.n1 == len(x1) and out.n2 == len(x2)
    assert out.d_stat == pytest.approx(d_ref, abs=1e-6)


def test_ks_identical_distributions(spark):
    x = np.arange(100.0)
    out = ks_2sample(_two_group_df(spark, x, x), "g", "v", "a", "b") \
        .collect()[0]
    assert out.d_stat == 0.0


@pytest.mark.parametrize("parts", [1, 5])
def test_mann_whitney_matches_numpy(spark, samples, parts):
    x1, x2 = samples
    out = mann_whitney_u(_two_group_df(spark, x1, x2, parts),
                         "g", "v", "a", "b").collect()[0]
    pooled = np.concatenate([x1, x2])
    ranks = _avg_ranks(pooled)
    r1 = ranks[:len(x1)].sum()
    n1, n2 = len(x1), len(x2)
    u1 = r1 - n1 * (n1 + 1) / 2
    assert out.u1 == pytest.approx(u1, abs=1e-6)
    assert out.u2 == pytest.approx(n1 * n2 - u1, abs=1e-6)
    # tie-corrected z twin
    _, counts = np.unique(pooled, return_counts=True)
    tie3 = float((counts ** 3 - counts).sum())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert out.z == pytest.approx(z, abs=1e-6)


def test_welch_matches_numpy(spark, samples):
    x1, x2 = samples
    out = welch_ttest(_two_group_df(spark, x1, x2),
                      "g", "v", "a", "b").collect()[0]
    se1, se2 = x1.var(ddof=1) / len(x1), x2.var(ddof=1) / len(x2)
    t = (x1.mean() - x2.mean()) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 ** 2 / (len(x1) - 1)
                             + se2 ** 2 / (len(x2) - 1))
    assert out.t_stat == pytest.approx(t, abs=1e-5)
    assert out.df == pytest.approx(df, abs=1e-4)
    assert (out.n1, out.n2) == (len(x1), len(x2))


def test_spearman_perfect_monotone(spark):
    x = np.arange(1.0, 51.0)
    df = spark.createDataFrame(
        [(float(v), float(v ** 3)) for v in x], "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]
    assert out.rho == pytest.approx(1.0, abs=1e-6)
    out2 = spearman_corr(
        df.select("x", (-F.col("y")).alias("y")), "x", "y").collect()[0]
    assert out2.rho == pytest.approx(-1.0, abs=1e-6)


def test_spearman_with_ties_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = np.round(rng.uniform(0, 10, 200), 0)   # heavy ties
    y = np.round(x * 2 + rng.normal(0, 5, 200), 0)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert out.rho == pytest.approx(rho, abs=1e-6)


def test_km_hand_case(spark):
    # classic toy: durations/observed, deaths at t=1 (n=5) and t=3 (n=3)
    spans = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)],
        "duration int, observed int")
    rows = {r.t: r for r in km_survival(spans).collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_risk == 5 and rows[1].d == 1
    assert rows[1].s_hat == pytest.approx(4 / 5, abs=1e-6)
    assert rows[3].n_risk == 3 and rows[3].d == 1
    assert rows[3].s_hat == pytest.approx(4 / 5 * 2 / 3, abs=1e-6)


def test_km_terminal_death_hits_zero(spark):
    # every subject dies at the max duration → S must reach exactly 0
    spans = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1)], "duration int, observed int")
    rows = {r.t: r for r in km_survival(spans).collect()}
    assert rows[1].s_hat == pytest.approx(2 / 3, abs=1e-6)
    assert rows[2].s_hat == 0.0


def test_cusum_detects_level_shift(spark):
    # 10 days at 10.0 then 10 days at 20.0 → drawup grows ~10/day after
    rows = []
    for d in range(20):
        day = f"2024-01-{d + 1:02d}"
        level = 10.0 if d < 10 else 20.0
        rows += [(day, level), (day, level)]
    df = spark.createDataFrame(rows, "day string, value double")
    out = {r.day: r for r in
           cusum_drift(df, F.col("day"), "value").collect()}
    assert len(out) == 20
    assert out["2024-01-10"].drawup == pytest.approx(0.0, abs=1e-6)
    # from the shift onward the one-sided CUSUM climbs by +5/day
    # (deviation from the 15.0 grand mean)
    assert out["2024-01-20"].drawup == pytest.approx(50.0, abs=1e-4)
