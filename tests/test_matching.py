"""Greedy maximal matching vs a pure-python twin + invariants."""

import numpy as np

from adopt_spark.algos.matching import MATCH_EDGE_MIX, greedy_matching
from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME
from tests.conftest import edge_df


def python_matching(pairs):
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    inc = {}
    for e in edges:
        inc.setdefault(e[0], set()).add(e)
        inc.setdefault(e[1], set()).add(e)

    def pri(e):
        a, b = e
        pkey = ((a % MIS_PRIME) * MATCH_EDGE_MIX + (b % MIS_PRIME)) % MIS_PRIME
        return (pkey * MIS_MULT % MIS_PRIME, a, b)

    active, matched = set(edges), set()
    while active:
        win = {e for e in active
               if all(c == e or c not in active or pri(c) > pri(e)
                      for c in inc[e[0]] | inc[e[1]])}
        matched |= win
        mv = {v for e in win for v in e}
        active = {e for e in active if e[0] not in mv and e[1] not in mv}
    return matched, edges, inc


def check(spark, pairs):
    got = {(r["sid"], r["tid"])
           for r in greedy_matching(edge_df(spark, pairs)).collect()}
    exp, edges, inc = python_matching(pairs)
    assert got == exp
    mv = [v for e in got for v in e]
    assert len(mv) == len(set(mv))                      # a matching
    covered = set(mv)
    for a, b in edges:                                  # maximal
        assert a in covered or b in covered


def test_matching_small_fixtures(spark):
    check(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4),
                  (1, 5), (4, 5)])
    check(spark, [(i, i + 1) for i in range(21)])        # path
    check(spark, [(0, i) for i in range(1, 15)])         # star -> 1 edge
    star = {(r["sid"], r["tid"]) for r in greedy_matching(
        edge_df(spark, [(0, i) for i in range(1, 15)])).collect()}
    assert len(star) == 1


def test_matching_random_graph(spark):
    rng = np.random.default_rng(11)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 70, (350, 2))
             if p[0] != p[1]}
    check(spark, sorted(pairs))


def test_matching_empty(spark):
    out = greedy_matching(edge_df(spark, []))
    assert out.count() == 0 and out.columns == ["sid", "tid"]


def _py_weighted_matching(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    wt = {(a, b): 1 + (a * 7 + b * 13) % 10 for a, b in und}
    act = set(und)
    matched = {}
    while act:
        # per-vertex best incident edge by (w desc, a, b)
        best = {}
        for (a, b) in act:
            key = (-wt[(a, b)], a, b)
            for v in (a, b):
                if v not in best or key < best[v]:
                    best[v] = key
        winners = {(a, b) for (a, b) in act
                   if best[a] == (-wt[(a, b)], a, b)
                   and best[b] == (-wt[(a, b)], a, b)}
        assert winners, "locally-dominant edge must exist"
        for e in winners:
            matched[e] = wt[e]
        dead = {v for e in winners for v in e}
        act = {(a, b) for (a, b) in act
               if a not in dead and b not in dead}
    return matched


def test_weighted_matching_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.matching import weighted_matching

    df, pairs = powerlaw_small
    want = _py_weighted_matching(pairs)
    got = {(r.sid, r.tid): r.w
           for r in weighted_matching(df).collect()}
    assert got == want


def test_weighted_matching_is_maximal_and_valid(spark, powerlaw_small):
    from adopt_spark.algos.matching import weighted_matching

    df, pairs = powerlaw_small
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    got = {(r.sid, r.tid) for r in weighted_matching(df).collect()}
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))            # vertex-disjoint
    matched_v = set(used)
    for a, b in und:                              # maximal
        assert a in matched_v or b in matched_v


def test_weighted_matching_prefers_heavy_edge(spark):
    from adopt_spark.algos.matching import weighted_matching

    # path 1-2-3: w(1,2) = 1+(7+26)%10 = 4, w(2,3) = 1+(14+39)%10 = 4
    # tie -> (a, b) order picks (1, 2); but with a heavier (2, 3)
    # alternative the heavy edge must win: use (0, 9): w = 1+117%10=8
    # path 0-9, 9-10: w(9,10) = 1+(63+130)%10 = 4 -> (0,9) wins
    df = spark.createDataFrame([(0, 9), (9, 10)], "sid long, tid long")
    got = {(r.sid, r.tid): r.w for r in weighted_matching(df).collect()}
    assert got == {(0, 9): 8}


def test_matching_monotone_chain_many_rounds(spark):
    """A path whose canonical edge keys increase monotonically along
    the chain makes only ONE edge locally dominant per round — the
    slow-progress regime that tripped the old 64-round cap on the
    sf0.1 graph (68 rounds measured). The default cap must absorb it;
    a tiny explicit cap must raise."""
    import pytest as _pytest

    from adopt_spark.algos.matching import greedy_matching

    n = 40
    pairs = [(i, i + 1) for i in range(n)]          # path 0-1-...-40
    df = spark.createDataFrame(pairs, "sid long, tid long")
    out = greedy_matching(df)                        # default cap
    got = {(r.sid, r.tid) for r in out.collect()}
    # maximal matching on a path: no two matched edges share a vertex,
    # and every unmatched edge touches a matched one
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))
    for a, b in pairs:
        assert (a, b) in got or any(v in used for v in (a, b))
    with _pytest.raises(RuntimeError, match="did not converge"):
        greedy_matching(df, max_rounds=2)
