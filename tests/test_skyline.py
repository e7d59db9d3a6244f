"""Skyline (Pareto frontier) vs a brute-force dominance twin."""

import numpy as np
import pytest

from adopt_spark.functions.skyline import skyline


def brute_skyline(rows, signs):
    """O(n^2) dominance check; rows = list of criterion tuples."""
    pts = [tuple(s * v for s, v in zip(signs, r)) for r in rows]
    keep = []
    for i, p in enumerate(pts):
        dominated = any(
            all(q[d] <= p[d] for d in range(len(p)))
            and any(q[d] < p[d] for d in range(len(p)))
            for j, q in enumerate(pts) if j != i)
        if not dominated:
            keep.append(i)
    return keep


def run_case(spark, data, minimize, maximize, n_parts):
    cols = [f"c{i}" for i in range(len(data[0]) - 1)] + ["id"]
    df = spark.createDataFrame(
        [tuple(map(float, r[:-1])) + (int(r[-1]),) for r in data],
        ", ".join(f"{c} double" for c in cols[:-1]) + ", id long",
    ).repartition(n_parts)
    got = {r["id"] for r in
           skyline(df, minimize=minimize, maximize=maximize).collect()}
    crit = [c for c in cols[:-1]]
    signs = [1.0 if c in minimize else -1.0 for c in crit]
    idx = brute_skyline([r[:-1] for r in data], signs)
    exp = {int(data[i][-1]) for i in idx}
    assert got == exp


def test_skyline_2d_random(spark):
    rng = np.random.default_rng(7)
    data = [(float(x), float(y), i)
            for i, (x, y) in enumerate(rng.integers(0, 40, (300, 2)))]
    # minimize c0, maximize c1 — and result must not depend on layout
    run_case(spark, data, ["c0"], ["c1"], n_parts=1)
    run_case(spark, data, ["c0"], ["c1"], n_parts=7)


def test_skyline_3d_with_duplicates(spark):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 6, (120, 3))        # small domain → many ties
    data = [(float(a), float(b), float(c), i)
            for i, (a, b, c) in enumerate(base)]
    run_case(spark, data, ["c0", "c1"], ["c2"], n_parts=5)


def test_skyline_all_minimize_single_winner(spark):
    # one strictly-dominating point → skyline is exactly that point
    data = [(float(i + 1), float(i + 1), i) for i in range(1, 20)]
    data.append((0.0, 0.0, 0))
    run_case(spark, data, ["c0", "c1"], [], n_parts=3)


def test_skyline_validates_columns(spark):
    df = spark.range(3).selectExpr("id", "cast(id as double) x")
    with pytest.raises(ValueError):
        skyline(df)
    with pytest.raises(ValueError):
        skyline(df, minimize=["nope"])
