"""Local sparsification (algos/sparsify.py) vs a pure-python twin.

The twin recomputes per-edge Jaccard (rounded 6 dp, the quantization
the engine ranks on), ranks each vertex's incident edges by
(jaccard desc, nbr asc), and keeps the union of per-vertex
top-ceil(deg^e) — the Satuluri union rule.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest


def _py_sparsify(pairs, exponent=0.5):
    lt = {(a, b) for a, b in pairs if a < b}
    adj = defaultdict(set)
    for a, b in lt:
        adj[a].add(b)
        adj[b].add(a)
    jac = {}
    for a, b in lt:
        cn = len(adj[a] & adj[b])
        jac[(a, b)] = round(cn / (len(adj[a]) + len(adj[b]) - cn), 6)
    keep = set()
    for v, ns in adj.items():
        budget = math.ceil(len(ns) ** exponent)
        ranked = sorted(ns, key=lambda n: (-jac[(min(v, n), max(v, n))], n))
        for n in ranked[:budget]:
            keep.add((min(v, n), max(v, n)))
    return {e: jac[e] for e in keep}


def test_local_sparsify_vs_python(spark, powerlaw_small):
    from adopt_spark.algos.sparsify import local_sparsify

    df, pairs = powerlaw_small
    want = _py_sparsify(pairs)
    got = {(r.sid, r.tid): r.jaccard
           for r in local_sparsify(df).collect()}
    assert got == want


def test_local_sparsify_invariants(spark, powerlaw_small):
    from adopt_spark.algos.sparsify import local_sparsify

    df, pairs = powerlaw_small
    lt = {(a, b) for a, b in pairs if a < b}
    kept = {(r.sid, r.tid) for r in local_sparsify(df).collect()}
    # kept is a subset, and every vertex keeps at least one edge
    assert kept <= lt
    verts = {v for e in lt for v in e}
    kept_verts = {v for e in kept for v in e}
    assert kept_verts == verts


def test_local_sparsify_exponent_one_keeps_all(spark):
    from adopt_spark.algos.sparsify import local_sparsify

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    assert local_sparsify(df, exponent=1.0).count() == len(pairs)


def test_local_sparsify_validates_exponent(spark):
    from adopt_spark.algos.sparsify import local_sparsify

    df = spark.createDataFrame([(0, 1)], "sid long, tid long")
    with pytest.raises(ValueError):
        local_sparsify(df, exponent=0.0)


def test_sparsify_report_counts(spark, powerlaw_small):
    from adopt_spark.algos.sparsify import sparsify_report

    df, pairs = powerlaw_small
    want_kept = len(_py_sparsify(pairs))
    row = sparsify_report(df).collect()[0]
    assert row.n_edges == len({(a, b) for a, b in pairs if a < b})
    assert row.n_kept == want_kept
    assert row.kept_frac == round(want_kept / row.n_edges, 6)
