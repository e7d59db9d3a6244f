"""Regular path queries: python product-BFS differential + automaton
semantics (round-3 session-13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adopt_spark.algos.rpq import rpq_pairs


def _led(spark, triples):
    return spark.createDataFrame(triples, "sid long, tid long, label string")


def _seeds(spark, vs):
    return spark.createDataFrame([(v,) for v in vs], "s long")


def _py_rpq(triples, transitions, seeds, accepts, start=0):
    adj: dict[int, list] = {}
    for s, t, l in triples:
        adj.setdefault(s, []).append((t, l))
    tr: dict[tuple, list] = {}
    for q, l, q2 in transitions:
        tr.setdefault((q, l), []).append(q2)
    out = set()
    for s0 in seeds:
        seen = {(s0, start)}
        stack = [(s0, start)]
        while stack:
            v, q = stack.pop()
            for t, l in adj.get(v, []):
                for q2 in tr.get((q, l), []):
                    if (t, q2) not in seen:
                        seen.add((t, q2))
                        stack.append((t, q2))
        out |= {(s0, v) for (v, q) in seen if q in accepts}
    return sorted(out)


def _rand_labeled(n=60, m=220, seed=13, labels="ab"):
    x, triples = seed, set()
    for _ in range(m):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = x % n
        x = (x * 1103515245 + 12345) % (1 << 31)
        t = x % n
        if s != t:
            triples.add((s, t, labels[(s + t) % len(labels)]))
    return sorted(triples)


def test_rpq_a_bstar_a_matches_python(spark):
    triples = _rand_labeled()
    # regex a b* a
    trans = [(0, "a", 1), (1, "b", 1), (1, "a", 2)]
    seeds = [0, 7, 14, 21]
    got, metrics = rpq_pairs(spark, _led(spark, triples), trans,
                             _seeds(spark, seeds), accept_states=[2])
    assert sorted(map(tuple, got.collect())) == \
        _py_rpq(triples, trans, seeds, {2})
    assert metrics[-1]["new_states"] == 0  # ran to fixpoint


def test_rpq_kleene_star_terminates_on_cycles(spark):
    # pure cycle of b-labels: (a?) b* must close the whole cycle
    triples = [(i, (i + 1) % 10, "b") for i in range(10)]
    trans = [(0, "b", 0)]  # b*
    got, _ = rpq_pairs(spark, _led(spark, triples), trans,
                       _seeds(spark, [0]), accept_states=[0])
    # empty path matches too (start state accepting)
    assert sorted(v for _, v in map(tuple, got.collect())) == list(range(10))


def test_rpq_empty_path_only_when_start_accepting(spark):
    triples = [(0, 1, "a")]
    got_acc, _ = rpq_pairs(spark, _led(spark, triples), [(0, "a", 1)],
                           _seeds(spark, [5]), accept_states=[0])
    assert sorted(map(tuple, got_acc.collect())) == [(5, 5)]
    got_no, _ = rpq_pairs(spark, _led(spark, triples), [(0, "a", 1)],
                          _seeds(spark, [5]), accept_states=[1])
    assert got_no.count() == 0


def test_rpq_nondeterministic_automaton(spark):
    # (ab)|(aa): NFA branches from state 1 on both labels
    triples = [(0, 1, "a"), (1, 2, "b"), (1, 3, "a"), (0, 4, "b")]
    trans = [(0, "a", 1), (1, "b", 2), (1, "a", 2)]
    got, _ = rpq_pairs(spark, _led(spark, triples), trans,
                       _seeds(spark, [0]), accept_states=[2])
    assert sorted(map(tuple, got.collect())) == [(0, 2), (0, 3)]
    assert _py_rpq(triples, trans, [0], {2}) == [(0, 2), (0, 3)]


def test_rpq_validation(spark):
    with pytest.raises(ValueError):
        rpq_pairs(spark, _led(spark, []), [], _seeds(spark, [0]), [0])
