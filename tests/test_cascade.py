"""Threshold cascade vs a pure-python bootstrap-percolation twin."""

import numpy as np
import pytest

from adopt_spark.algos.cascade import threshold_cascade
from tests.conftest import edge_df


def py_cascade(pairs, seeds, theta, rounds=50):
    sym = {}
    for a, b in pairs:
        if a == b:
            continue
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    active = {s: 0 for s in seeds}
    for i in range(1, rounds + 1):
        newly = [v for v, ns in sym.items()
                 if v not in active
                 and sum(1 for u in ns if u in active) >= theta]
        if not newly:
            break
        for v in newly:
            active[v] = i
    return active


def _seed_df(spark, ids):
    return spark.createDataFrame([(int(v),) for v in ids], "v long")


def test_cascade_line_needs_two(spark):
    """theta=2 on a path never spreads; on a ladder it does."""
    path = [(0, 1), (1, 2), (2, 3)]
    active, _ = threshold_cascade(spark, edge_df(spark, path),
                                  _seed_df(spark, [0, 1]), theta=2)
    got = {r["v"]: r["round"] for r in active.collect()}
    assert got == {0: 0, 1: 0}  # vertex 2 has only one active neighbor
    tri_chain = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    active, _ = threshold_cascade(spark, edge_df(spark, tri_chain),
                                  _seed_df(spark, [0, 1]), theta=2)
    got = {r["v"]: r["round"] for r in active.collect()}
    assert got == py_cascade(tri_chain, [0, 1], 2) == \
        {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


@pytest.mark.parametrize("theta", [1, 2, 3])
def test_cascade_random_differential(spark, powerlaw_small, theta):
    df, pairs = powerlaw_small
    seeds = list(range(10))
    active, metrics = threshold_cascade(spark, df, _seed_df(spark, seeds),
                                        theta=theta, rounds=40)
    got = {r["v"]: r["round"] for r in active.collect()}
    assert got == py_cascade(pairs, seeds, theta)
    assert metrics[-1]["activated"] == 0 or len(metrics) == 40


def test_cascade_monotone_and_partition_invariant(spark, two_components):
    df, pairs = two_components
    seeds = [0, 1, 2]
    a1, _ = threshold_cascade(spark, df.repartition(1),
                              _seed_df(spark, seeds), theta=2)
    a8, _ = threshold_cascade(spark, df.repartition(8),
                              _seed_df(spark, seeds), theta=2)
    r1 = sorted(map(tuple, a1.collect()))
    assert r1 == sorted(map(tuple, a8.collect()))
    # seeds in component 0 never activate component 100
    assert all(v < 100 for v, _ in r1)


def test_cascade_validates_theta(spark, tri6):
    df, _ = tri6
    with pytest.raises(ValueError):
        threshold_cascade(spark, df, _seed_df(spark, [0]), theta=0)


def test_seed_quality_clique_seeds_dominate(spark):
    """On a planted-K8 + sparse-background fixture, seeding INSIDE
    the clique (min ids) ignites it, while the LCG rule's scattered
    seeds activate nothing beyond themselves at theta=2."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    k8 = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    chain = [(100 + i, 101 + i) for i in range(40)]
    df = spark.createDataFrame(k8 + chain, "sid long, tid long")
    with mock.patch.object(R, "derived_edges_sparse",
                           lambda s_, sf: df):
        got = {r.rule: r for r in R.q_seed_quality(spark, "x").collect()}
    assert set(got) == {"min_id", "top_degree", "lcg"}
    # min-id seeds include the whole K8 -> clique fully active
    assert got["min_id"].n_active >= 8
    for r in got.values():
        assert r.n_seeds == 25
        assert r.n_active >= 25          # seeds stay active
        assert r.max_round >= 0
