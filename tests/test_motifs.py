"""Motif SQL generator vs DuckDB on identical edge data.

This is the reference's own correctness surface: the generated
n-clique/n-cycle queries must count exactly what the reference's
graph_query/*.sql count — verified differentially by running the SAME
generated SQL in DuckDB over the same rows.
"""

import duckdb
import pandas as pd
import pytest

from adopt_spark.algos.motifs import clique_sql, count_clique, count_cycle, cycle_sql
from adopt_spark.algos.triangles import triangle_count


def duck_count(pairs, sql):
    con = duckdb.connect()
    edge = pd.DataFrame(pairs, columns=["sid", "tid"])
    con.register("edge", edge)
    return con.execute(sql).fetchone()[0]


@pytest.mark.parametrize("n", [3, 4])
def test_clique_counts(spark, powerlaw_small, n):
    df, pairs = powerlaw_small
    sql = clique_sql(n)
    expected = duck_count(pairs, sql)
    got = count_clique(spark, df, n).collect()[0]["n"]
    assert got == expected


@pytest.mark.parametrize("n", [4, 5, 6])
def test_cycle_counts(spark, tri6, n):
    df, pairs = tri6
    sql = cycle_sql(n)
    expected = duck_count(pairs, sql)
    got = count_cycle(spark, df, n).collect()[0]["n"]
    assert got == expected


def test_cycle_counts_powerlaw(spark, powerlaw_small):
    df, pairs = powerlaw_small
    for n in (4,):
        expected = duck_count(pairs, cycle_sql(n))
        got = count_cycle(spark, df, n).collect()[0]["n"]
        assert got == expected


def test_3clique_equals_triangle_impls(spark, powerlaw_small):
    df, pairs = powerlaw_small
    via_sql = count_clique(spark, df, 3).collect()[0]["n"]
    assert triangle_count(df, "join").collect()[0][0] == via_sql
    assert triangle_count(df, "csr").collect()[0][0] == via_sql


def test_range_motif(spark, powerlaw_small):
    df, pairs = powerlaw_small
    preds = {1: 75, 2: 150, 3: 225}  # ~a0.25_b0.5_c0.75 selectivity variant
    sql = clique_sql(3, range_preds=preds)
    expected = duck_count(pairs, sql)
    got = count_clique(spark, df, 3, range_preds=preds).collect()[0]["n"]
    assert got == expected


def test_order_cardinalities_vs_python(spark):
    """Prefix-join sizes replayed by brute-force assignment counting
    on a small graph; the selective order's peak must undercut the
    naive chain's on a wedge-heavy fixture."""
    import itertools
    from collections import defaultdict

    from adopt_spark.algos.motifs import DIAMOND, order_cardinalities

    # hub fixture: star around 0 + a few closing edges -> chain order
    # fans out, triangle-first stays small
    pairs = [(0, i) for i in range(1, 12)] + \
            [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (5, 6), (6, 7)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    orders = {"tri_first": [0, 4, 1, 3, 2], "chain": [0, 1, 2, 3, 4]}
    got = {(r.ord_name, r.step): r.n_rows
           for r in order_cardinalities(df, DIAMOND, orders).collect()}

    lt = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    for name, idxs in orders.items():
        assigned = [{}]
        for step, ai in enumerate(idxs, 1):
            sv, tv, _ = DIAMOND[ai]
            new = []
            for asg in assigned:
                for a, b in lt:
                    cand = dict(asg)
                    ok = True
                    for var, val in ((sv, a), (tv, b)):
                        if var in cand and cand[var] != val:
                            ok = False
                            break
                        cand[var] = val
                    if ok:
                        new.append(cand)
            # dedup assignments over the covered vars
            seen_vars = sorted({v for j in idxs[:step]
                                for v in DIAMOND[j][:2]})
            uniq = {tuple(c[v] for v in seen_vars) for c in new}
            assigned = [dict(zip(seen_vars, t)) for t in uniq]
            assert got[(name, step)] == len(uniq), (name, step)
    # the report exposes a real regret gap between orders (which
    # order wins is data-dependent — exactly why the reference
    # learns it adaptively; on this hub fixture the chain wins)
    peak = lambda n: max(got[(n, k)] for k in range(1, 6))
    assert peak("chain") != peak("tri_first")
    # all orders agree on the final (full-pattern) cardinality
    assert got[("chain", 5)] == got[("tri_first", 5)]


def test_order_cardinalities_validation(spark):
    import pytest as _pytest

    from adopt_spark.algos.motifs import DIAMOND, order_cardinalities

    df = spark.createDataFrame([(0, 1)], "sid long, tid long")
    with _pytest.raises(ValueError):
        order_cardinalities(df, DIAMOND, {"bad": [0, 1]})
    with _pytest.raises(ValueError):
        # (3,4) then (1,2): disconnected second step
        order_cardinalities(df, DIAMOND, {"disc": [2, 0, 1, 3, 4]})


def test_balance_census_vs_python(spark, powerlaw_small):
    from unittest import mock

    from adopt_spark.queries import registry as R

    df, pairs = powerlaw_small
    with mock.patch.object(R, "derived_edges", lambda s_, sf: df):
        row = R.q_balance_census(spark, "x").collect()[0]

    lt = {(a, b) for a, b in pairs if a < b}
    adj = {}
    for a, b in lt:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    neg = lambda a, b: (1 + (a * 7 + b * 13) % 10) % 2 == 1
    counts = [0, 0, 0, 0]
    for a, b in lt:
        for c in (adj[a] & adj[b]):
            if c > b:
                k = sum([neg(a, b), neg(a, c), neg(b, c)])
                counts[k] += 1
    total = sum(counts)
    assert [row.n_0neg, row.n_1neg, row.n_2neg, row.n_3neg] == counts
    assert row.n_triangles == total
    assert row.balanced_frac == round((counts[0] + counts[2]) / total, 6)


def test_edge_swap_null_vs_python(spark, powerlaw_small):
    """The whole deterministic swap round replayed in python:
    pairing, acceptance, collisions, triangle counts — plus the
    degree-preservation law on the accepted swaps."""
    from collections import Counter

    from adopt_spark.algos.nullmodel import (
        SWAP_A, SWAP_B, SWAP_M, edge_swap_null,
    )

    df, pairs = powerlaw_small
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b},
                 key=lambda e: ((e[0] * SWAP_A + e[1] * SWAP_B) % SWAP_M,
                                e[0], e[1]))
    und_set = set(und)
    rewired_all = []
    n_acc = 0
    for i in range(0, len(und) - 1, 2):
        (a1, b1), (a2, b2) = und[i], und[i + 1]
        f1 = (min(a1, b2), max(a1, b2))
        f2 = (min(a2, b1), max(a2, b1))
        ok = (f1[0] != f1[1] and f2[0] != f2[1] and f1 != f2
              and f1 not in und_set and f2 not in und_set)
        if ok:
            n_acc += 1
            rewired_all += [f1, f2]
        else:
            rewired_all += [(a1, b1), (a2, b2)]
    if len(und) % 2:
        rewired_all.append(und[-1])
    rewired = set(rewired_all)

    def tri(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return sum(1 for a, b in es for c in adj[a] & adj[b] if c > b)

    row = edge_swap_null(df).collect()[0]
    assert row.n_edges == len(und)
    assert row.n_pairs == len(und) // 2
    assert row.n_accepted == n_acc
    assert row.n_collisions == len(rewired_all) - len(rewired)
    assert row.tri_before == tri(und_set)
    assert row.tri_after == tri(rewired)
    # degree preservation (pre-dedup): swaps never change degrees
    assert Counter(v for e in rewired_all for v in e) == \
        Counter(v for e in und for v in e)
