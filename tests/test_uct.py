"""UCT join-order learner (algos/uct.py) — differential + behavior tests.

Correctness bar: the learned-order count is EXACT whatever the learner
does (slices partition the work; fallback guarantees completion), so
every test compares against the static motif SQL over the same edges.
"""

from __future__ import annotations

import pytest

from adopt_spark.algos.motifs import clique_sql, cycle_sql
from adopt_spark.algos.uct import (
    Atom, MotifQuery, clique_query, cycle_query, uct_motif_count,
)
from adopt_spark.edges import derived_edges

from .conftest import SF_TINY, edge_df


def _sql_count(spark, edges, sql_body):
    edges.createOrReplaceTempView("edge")
    return spark.sql(sql_body).collect()[0][0]


@pytest.mark.parametrize("mk_query,mk_sql", [
    (clique_query, clique_sql),
    (cycle_query, cycle_sql),
])
@pytest.mark.parametrize("n", [3, 4])
def test_uct_matches_static_sql_on_derived_graph(spark, mk_query, mk_sql, n):
    edges = derived_edges(spark, SF_TINY)
    want = _sql_count(spark, edges, mk_sql(n))
    got, info = uct_motif_count(spark, edges, mk_query(n),
                                n_slices=5, seed=11)
    assert got == want
    # every executed order is a permutation of 1..n
    for ep in info.episodes:
        assert sorted(ep.order) == list(range(1, n + 1))


def test_uct_on_handmade_graph(spark, tri6):
    edges, _ = tri6
    want = _sql_count(spark, edges, clique_sql(3))
    got, _ = uct_motif_count(spark, edges, clique_query(3),
                             n_slices=3, seed=0)
    assert got == want == 2


def test_slice_count_invariance(spark):
    """The count must not depend on how the work was sliced."""
    edges = derived_edges(spark, SF_TINY)
    q = cycle_query(4)
    got3, _ = uct_motif_count(spark, edges, q, n_slices=3, seed=1)
    got7, _ = uct_motif_count(spark, edges, q, n_slices=7, seed=2)
    assert got3 == got7 == _sql_count(spark, edges, cycle_sql(4))


def test_budget_abort_falls_back_and_stays_exact(spark):
    """A starvation budget aborts episodes (the reference's exhausted
    budget) — the slice re-queues and ultimately the uncapped canonical
    order completes it, so the count is still exact."""
    edges = derived_edges(spark, SF_TINY)
    want = _sql_count(spark, edges, clique_sql(3))
    got, info = uct_motif_count(spark, edges, clique_query(3),
                                n_slices=4, cap_factor=0.0, seed=5)
    # cap floor is 64 rows/level: the tiny graph's vertex set exceeds it
    assert any(not ep.completed for ep in info.episodes)
    assert info.fallback_slices > 0
    assert got == want


def test_optimal_order_is_connected_prefix(spark):
    edges = derived_edges(spark, SF_TINY)
    q = cycle_query(4)
    _, info = uct_motif_count(spark, edges, q, n_slices=6, seed=9)
    order = list(info.optimal_order)
    assert sorted(order) == [1, 2, 3, 4]
    bound = frozenset({order[0]})
    for v in order[1:]:
        assert q.connects(v, bound)
        bound = bound | {v}


def test_deterministic_given_seed(spark):
    edges = derived_edges(spark, SF_TINY)
    q = clique_query(3)
    _, a = uct_motif_count(spark, edges, q, n_slices=4, seed=21)
    _, b = uct_motif_count(spark, edges, q, n_slices=4, seed=21)
    assert [e.order for e in a.episodes] == [e.order for e in b.episodes]
    assert a.optimal_order == b.optimal_order


def test_rewards_rank_orders_by_work(spark):
    """Completed episodes' rewards must be monotone decreasing in the
    intermediate-row work they caused — the learning signal itself."""
    edges = derived_edges(spark, SF_TINY)
    _, info = uct_motif_count(spark, edges, cycle_query(4),
                              n_slices=6, seed=13)
    done = [e for e in info.episodes if e.completed]
    assert done
    by_work = sorted(done, key=lambda e: e.work)
    rewards = [e.reward for e in by_work]
    assert rewards == sorted(rewards, reverse=True)
    assert all(0.0 < r <= 1.0 for r in rewards)


@pytest.mark.parametrize("bounds", [
    {},
    {1: 500, 2: 1000, 4: 1500},
    {1: 50},
])
def test_uct_selectivity_encoding(spark, bounds):
    """Directed selectivity encoding with per-variable upper bounds —
    UCT count must equal the generated SQL for every bound shape."""
    from adopt_spark.algos.motifs import selectivity_cycle_sql
    from adopt_spark.algos.uct import selectivity_cycle_uct

    edges = derived_edges(spark, SF_TINY)
    want = _sql_count(spark, edges,
                      selectivity_cycle_sql(4, bounds=bounds or None))
    got, _ = uct_motif_count(spark, edges, selectivity_cycle_uct(4, bounds),
                             n_slices=4, seed=17)
    assert got == want


def test_learner_exploits_selectivity_skew(spark):
    """With a tight bound on v1, orders that bind v1 (or its
    bounded-atom neighbor v2) early are strictly cheaper; the exploit
    phase must run such an order and do less work than the worst
    completed exploration episode. Deterministic given the seed."""
    from adopt_spark.algos.uct import selectivity_cycle_uct

    edges = derived_edges(spark, SF_TINY)
    q = selectivity_cycle_uct(4, {1: 50})
    total, info = uct_motif_count(spark, edges, q, n_slices=6,
                                  explore_frac=0.67, seed=23)
    assert info.optimal_order[0] in (1, 2)
    explored = info.episodes[:len(info.episodes) - 2]
    exploit = info.episodes[-2:]
    worst = max(e.work for e in explored if e.completed)
    assert all(e.completed and e.work < worst for e in exploit)


def test_disconnected_playout_cartesian_path(spark):
    """A two-atom query over disjoint variable pairs forces the
    Cartesian branch (no connected action exists at level 2 from some
    states) — kept for generality; count must equal the product."""
    edges = edge_df(spark, [(0, 1), (0, 2), (3, 4)])
    q = MotifQuery(4, (Atom(1, 2, lt=True), Atom(3, 4, lt=True)))
    got, _ = uct_motif_count(spark, edges, q, n_slices=2, seed=4)
    # lt-edges: (0,1),(0,2),(3,4) -> 3 choices for (v1,v2) x 3 for (v3,v4)
    assert got == 9
