"""Measured UCT order-learning evidence → BENCH/uct.json.

The reference's namesake mechanism (ParallelUctNodeLFTJ.java) is only
worth shipping if the learner measurably reduces work on a query where
the variable order matters. This script quantifies that on the
selectivity-bounded 4-cycle (the order-sensitive family: bounded
variables are the cheap ones to bind early), over the driver-contract
derived edge graph:

  1. Enumerates EVERY connected variable order and runs each, uncapped,
     on one fixed hash slice — the search space the learner navigates,
     and the per-order work (sum of intermediate cardinalities, the
     same work currency the reward uses).
  2. Runs the full ``uct_motif_count`` (explore + exploit phases) and
     records its total work, wall time, learned order and fallbacks.
  3. Runs the canonical order (the no-learner baseline every fallback
     uses) uncapped on all slices for the same total.

Comparing (2) against (3) and against the worst order's extrapolated
total shows what learning buys: the exploit phase runs only the
cheapest order found, so UCT total work must land near
``best_order_work x n_slices`` plus the bounded exploration overhead.

Usage: python scripts/bench_uct.py [sf_dir] [n_slices]
"""

from __future__ import annotations

import json
import os
import sys
import time
from itertools import permutations

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + \
    os.environ.get("PYTHONPATH", "")


def connected_orders(query) -> list[list[int]]:
    out = []
    for perm in permutations(range(1, query.n_vars + 1)):
        bound = frozenset([perm[0]])
        ok = True
        for v in perm[1:]:
            if not query.connects(v, bound):
                ok = False
                break
            bound = bound | {v}
        if ok:
            out.append(list(perm))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from adopt_spark.algos.uct import (_run_order, selectivity_cycle_uct,
                                       uct_motif_count)
    from adopt_spark.edges import derived_edges
    from adopt_spark.queries.registry import _SEL_4CYCLE
    from adopt_spark.session import get_spark

    spark = get_spark("bench-uct")
    edges = derived_edges(spark, sf_dir).persist()
    n_edges = edges.count()
    denom = max(1.0, n_edges / n_slices)

    def measure(query) -> dict:
        # 1. the search space: every connected order, uncapped, slice 0
        orders = {}
        for order in connected_orders(query):
            t0 = time.time()
            res = _run_order(edges, query, order, slice_var=1,
                             n_slices=n_slices, slice_id=0, cap=None,
                             denom=denom)
            orders["".join(map(str, order))] = {
                "work_rows": res.work, "count": res.count,
                "sec": round(time.time() - t0, 3)}
        works = {k: v["work_rows"] for k, v in orders.items()}
        best = min(works, key=works.get)
        worst = max(works, key=works.get)

        # 2. the learner, end to end
        t0 = time.time()
        total, info = uct_motif_count(spark, edges, query,
                                      n_slices=n_slices, seed=7)
        uct_sec = round(time.time() - t0, 3)
        uct_work = sum(e.work for e in info.episodes)
        non_optimal = [e for e in info.episodes
                       if e.order != info.optimal_order]

        # 3. no-learner baseline: canonical order, every slice, uncapped
        canonical = list(range(1, query.n_vars + 1))
        t0 = time.time()
        canon_work = canon_total = 0
        for s in range(n_slices):
            r = _run_order(edges, query, canonical, 1, n_slices, s,
                           None, denom)
            canon_work += r.work
            canon_total += r.count
        canon_sec = round(time.time() - t0, 3)
        assert total == canon_total, (total, canon_total)

        return {
            "orders_probe_slice0": orders,
            "order_work_spread": round(
                works[worst] / max(1, works[best]), 2),
            "best_order": best, "worst_order": worst,
            "learned_order": "".join(map(str, info.optimal_order)),
            "motif_count": total,
            "uct": {"total_work_rows": uct_work, "sec": uct_sec,
                    "episodes": len(info.episodes),
                    "fallback_slices": info.fallback_slices,
                    "non_optimal_orders_tried":
                        ["".join(map(str, e.order)) for e in non_optimal]},
            "canonical_all_slices": {"total_work_rows": canon_work,
                                     "sec": canon_sec},
            "worst_order_extrapolated_work_rows": works[worst] * n_slices,
            "uct_vs_canonical_work": round(
                uct_work / max(1, canon_work), 3),
            "uct_vs_worst_work": round(
                uct_work / max(1, works[worst] * n_slices), 3),
        }

    # Two regimes: the contract query's bounds make the canonical order
    # near-optimal already (measures pure exploration overhead — the
    # price of learning when there is nothing to learn), and a
    # late-variable-bounded query where canonical is genuinely the
    # wrong order (measures what learning buys).
    hostile = {3: 500, 4: 1000}
    out = {
        "sf_dir": sf_dir, "n_edges": n_edges, "n_slices": n_slices,
        "canonical_near_optimal": {
            "query": f"selectivity_cycle(4, bounds={_SEL_4CYCLE})",
            **measure(selectivity_cycle_uct(4, _SEL_4CYCLE))},
        "canonical_hostile": {
            "query": f"selectivity_cycle(4, bounds={hostile})",
            **measure(selectivity_cycle_uct(4, hostile))},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "uct.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
