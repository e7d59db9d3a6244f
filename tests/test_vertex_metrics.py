"""Per-vertex triangles / clustering coefficients / link prediction
vs pure-python oracles on the shared graph fixtures."""

from __future__ import annotations

import math

import pytest

from adopt_spark.algos.vertex_metrics import (
    clustering_coefficients, common_neighbor_scores, vertex_triangle_counts,
)


def py_vertex_metrics(pairs):
    es = {(a, b) for a, b in pairs if a < b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # count each a<b<c triangle once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return adj, tri


def test_vertex_triangles_tri6(spark, tri6):
    edges, pairs = tri6
    adj, tri = py_vertex_metrics(pairs)
    got = {int(r["v"]): int(r["tri"])
           for r in vertex_triangle_counts(edges).collect()}
    assert got == {v: t for v, t in tri.items() if t > 0}


def test_vertex_triangles_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    adj, tri = py_vertex_metrics(pairs)
    rows = vertex_triangle_counts(edges).collect()
    got = {int(r["v"]): int(r["tri"]) for r in rows}
    assert got == {v: t for v, t in tri.items() if t > 0}
    # corner sum identity: 3 triangles counted per corner
    from tests.conftest import py_triangles
    assert sum(got.values()) == 3 * py_triangles(pairs)


def test_clustering_coefficients_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    adj, tri = py_vertex_metrics(pairs)
    rows = clustering_coefficients(edges).collect()
    got = {int(r["v"]): (int(r["deg"]), int(r["tri"]), float(r["coeff"]))
           for r in rows}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            assert v not in got
            continue
        coeff = round(2.0 * tri[v] / (d * (d - 1)), 6)
        assert got[v] == (d, tri[v], pytest.approx(coeff))


def test_common_neighbors_tri6(spark, tri6):
    edges, pairs = tri6
    # non-edges with >=2 common neighbors, by hand on the fixture:
    # 1-4 share {2, 5}; 0-3/0-4/1-3 share only {2}; 2-5 shares {1, 4}
    rows = common_neighbor_scores(edges, min_common=2).collect()
    got = {(int(r["u"]), int(r["v"])): int(r["cn"]) for r in rows}
    assert got == {(1, 4): 2, (2, 5): 2}
    adj, _ = py_vertex_metrics(pairs)
    aa = {(int(r["u"]), int(r["v"])): float(r["aa"]) for r in rows}
    for (u, v), score in aa.items():
        expect = round(sum(1.0 / math.log(len(adj[w]))
                           for w in adj[u] & adj[v]), 6)
        assert score == pytest.approx(expect)


def test_common_neighbors_excludes_edges_and_respects_cap(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    adj, _ = py_vertex_metrics(pairs)
    es = {(a, b) for a, b in pairs if a < b}
    rows = common_neighbor_scores(edges, min_common=3).collect()
    for r in rows:
        u, v = int(r["u"]), int(r["v"])
        assert (u, v) not in es
        assert len(adj[u] & adj[v]) == int(r["cn"]) >= 3
    # hub-capped variant only loses pairs whose middles were all hubs
    capped = common_neighbor_scores(edges, min_common=3,
                                    max_wedge_degree=10).collect()
    for r in capped:
        u, v = int(r["u"]), int(r["v"])
        mids = {w for w in adj[u] & adj[v] if len(adj[w]) <= 10}
        assert int(r["cn"]) == len(mids)


def test_edge_jaccard_vs_python(spark):
    import numpy as np

    from adopt_spark.algos.vertex_metrics import edge_jaccard

    rng = np.random.default_rng(13)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 30, (150, 2))
             if a < b}
    df = spark.createDataFrame(sorted(pairs), "sid long, tid long")
    got = {(r.sid, r.tid): (r.cn, r.jaccard)
           for r in edge_jaccard(df).collect()}

    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    assert set(got) == pairs
    for a, b in pairs:
        cn = len(nbrs[a] & nbrs[b])
        j = round(cn / (len(nbrs[a]) + len(nbrs[b]) - cn), 6)
        assert got[(a, b)] == (cn, j), (a, b)


def test_edge_jaccard_triangle_plus_pendant(spark):
    from adopt_spark.algos.vertex_metrics import edge_jaccard

    # triangle 0-1-2 plus pendant 2-3
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "sid long, tid long")
    got = {(r.sid, r.tid): (r.cn, r.jaccard)
           for r in edge_jaccard(df).collect()}
    assert got[(0, 1)] == (1, round(1 / 3, 6))   # share vertex 2
    assert got[(0, 2)] == (1, 0.25)              # deg(2)=3
    assert got[(2, 3)] == (0, 0.0)


def test_assortativity_vs_numpy(spark, powerlaw_small):
    import numpy as np

    from adopt_spark.algos.vertex_metrics import assortativity

    edges, pairs = powerlaw_small
    es = {(a, b) for a, b in pairs if a != b}
    es = {(min(a, b), max(a, b)) for a, b in es}
    deg: dict[int, int] = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in es:          # both orientations, like the kernel
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    exp = float(np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1])

    row = assortativity(edges).collect()[0]
    assert row["n_vertices"] == len(deg)
    assert row["n_edges"] == len(es)
    assert math.isclose(row["assortativity"], exp, abs_tol=2e-6)


def test_assortativity_star_is_degenerate_or_negative(spark):
    """A star graph: every edge links the hub to a leaf -> r = -1 when
    leaves differ in count... actually all leaves have deg 1 and hub n,
    so x is constant given y; Pearson r is exactly -1 for a star with
    >= 2 leaves plus one extra edge breaking symmetry — use a double
    star (two hubs joined) where assortativity is strongly negative."""
    pairs = [(0, i) for i in range(1, 6)] + [(10, i) for i in range(11, 16)]
    pairs.append((0, 10))
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(pairs, "sid long, tid long")
    from adopt_spark.algos.vertex_metrics import assortativity

    r = assortativity(df).collect()[0]["assortativity"]
    assert r < -0.8


def test_orbit3_vs_brute_force(spark):
    """GDV orbits 0-3 vs direct wedge/triangle enumeration."""
    import itertools

    import numpy as np

    from adopt_spark.algos.vertex_metrics import orbit_counts_3

    rng = np.random.default_rng(23)
    pairs = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, 20, size=(60, 2))
                    if a != b})
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v in adj:
        deg = len(adj[v])
        tri = sum(1 for u, w in itertools.combinations(adj[v], 2)
                  if w in adj[u])
        # wedge with v as END: u-w paths through a neighbor w of v
        o1 = sum(len(adj[w]) - 1 for w in adj[v]) - 2 * tri
        o2 = deg * (deg - 1) // 2 - tri
        want[v] = (deg, o1, o2, tri)
    df = spark.createDataFrame(pairs, "sid long, tid long")
    got = {r.v: (r.o0, r.o1, r.o2, r.o3)
           for r in orbit_counts_3(spark.createDataFrame(
               pairs, "sid long, tid long")).collect()}
    assert got == want
    # identity: total wedges counted from ends = 2x from centers
    assert sum(o1 for _, o1, _, _ in got.values()) == \
        2 * sum(o2 for _, _, o2, _ in got.values())


def test_link_prediction_auc_vs_python(spark):
    """Exact AUC vs a pair-enumerating python reference implementing
    the same split/negatives/scores."""
    import numpy as np

    from adopt_spark.algos.vertex_metrics import link_prediction_auc
    from adopt_spark.functions.sampling import _NEG_A, _NEG_B

    rng = np.random.default_rng(41)
    pairs = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, 40, size=(220, 2))
                    if a != b})
    df = spark.createDataFrame(pairs, "sid long, tid long")
    row = link_prediction_auc(df, holdout_mod=5, k_neg=2,
                              m_neg=6).collect()[0]

    test = [(a, b) for a, b in pairs if (a * 1_000_003 + b) % 5 == 0]
    train = [(a, b) for a, b in pairs if (a * 1_000_003 + b) % 5 != 0]
    adj: dict[int, set] = {}
    for a, b in train:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    negs = set()
    for v in verts:
        got = 0
        for slot in range(6):
            ci = ((_NEG_A % n) * (idx[v] + 1)
                  + (_NEG_B % n) * (slot + 1)) % n
            d = verts[ci]
            if d == v or d in adj[v]:
                continue
            got += 1
            if got <= 2:
                negs.add(tuple(sorted((v, d))))
    negs -= set(pairs)

    def cn(u, v):
        return len(adj.get(u, set()) & adj.get(v, set()))

    ps = [cn(u, v) for u, v in test]
    ns = [cn(u, v) for u, v in negs]
    assert row.n_pos == len(ps) and row.n_neg == len(ns)
    wins = sum(1 for p in ps for q in ns if p > q)
    ties = sum(1 for p in ps for q in ns if p == q)
    auc = (wins + 0.5 * ties) / (len(ps) * len(ns))
    assert abs(row.auc - round(auc, 6)) < 1e-9


def test_structural_equiv_planted_mirrors(spark):
    from adopt_spark.algos.vertex_metrics import structural_equiv

    # 10, 11, 12 all link to exactly {1, 2, 3}; 20, 21 to exactly {4};
    # 30 has a unique neighborhood.
    pairs = ([(v, n) for v in (10, 11, 12) for n in (1, 2, 3)]
             + [(4, 20), (4, 21), (5, 30), (6, 30)])
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "sid long, tid long")
    got = {r.class_rep: (r.n_members, r.deg)
           for r in structural_equiv(df).collect()}
    # duals mirror too: 1,2,3 all link to exactly {10,11,12}, and 5,6
    # to exactly {30}
    assert got == {10: (3, 3), 20: (2, 1), 1: (3, 3), 5: (2, 1)}


def test_structural_equiv_vs_python(spark, powerlaw_small):
    from collections import defaultdict

    from adopt_spark.algos.vertex_metrics import structural_equiv

    df, pairs = powerlaw_small
    adj = defaultdict(set)
    for a, b in pairs:
        if a < b:
            adj[a].add(b)
            adj[b].add(a)
    classes = defaultdict(list)
    for v, ns in adj.items():
        classes[frozenset(ns)].append(v)
    want = sorted((min(vs), len(vs), len(ns))
                  for ns, vs in classes.items() if len(vs) >= 2)
    got = sorted((r.class_rep, r.n_members, r.deg)
                 for r in structural_equiv(df).collect())
    assert got == want


def test_quotient_graph_vs_python(spark, powerlaw_small):
    from collections import defaultdict

    from adopt_spark.algos.vertex_metrics import quotient_graph

    df, pairs = powerlaw_small
    adj = defaultdict(set)
    lt = {(a, b) for a, b in pairs if a < b}
    for a, b in lt:
        adj[a].add(b)
        adj[b].add(a)
    rep = {}
    by_adj = defaultdict(list)
    for v, ns in adj.items():
        by_adj[frozenset(ns)].append(v)
    for vs in by_adj.values():
        for v in vs:
            rep[v] = min(vs)
    q_edges = {(min(rep[a], rep[b]), max(rep[a], rep[b])) for a, b in lt}
    row = quotient_graph(df).collect()[0]
    assert row.n_vertices == len(adj)
    assert row.n_classes == len(by_adj)
    assert row.n_edges == len(lt)
    assert row.n_quotient_edges == len(q_edges)
    assert row.vertex_ratio == round(len(by_adj) / len(adj), 6)


def test_quotient_graph_collapses_mirrors(spark):
    from adopt_spark.algos.vertex_metrics import quotient_graph

    # 3 mirrors of {1,2,3} + their duals: 6 vertices, 2 classes,
    # 9 edges, 1 quotient edge
    pairs = [(v, n) for v in (10, 11, 12) for n in (1, 2, 3)]
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "sid long, tid long")
    row = quotient_graph(df).collect()[0]
    assert (row.n_vertices, row.n_classes) == (6, 2)
    assert (row.n_edges, row.n_quotient_edges) == (9, 1)
