"""Connected components vs union-find; LPA determinism/fixpoint."""

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.lpa import label_propagation
from tests.conftest import edge_df, py_components


def check_cc(spark, df, pairs):
    expected = py_components(pairs)
    labels, metrics = connected_components(spark, df)
    got = {r["v"]: r["component"] for r in labels.collect()}
    assert got == expected
    return metrics


def test_cc_two_components(spark, two_components):
    df, pairs = two_components
    metrics = check_cc(spark, df, pairs)
    labels, _ = connected_components(spark, df)
    comps = {r["component"] for r in labels.collect()}
    assert comps == {0, 100}
    assert len(metrics) >= 1


def test_cc_tri6(spark, tri6):
    df, pairs = tri6
    check_cc(spark, df, pairs)


def test_cc_star_hub(spark, star_hub):
    df, pairs = star_hub
    check_cc(spark, df, pairs)


def test_cc_powerlaw(spark, powerlaw_small):
    df, pairs = powerlaw_small
    check_cc(spark, df, pairs)


def test_lpa_two_components_separate_labels(spark, two_components):
    df, pairs = two_components
    labels, metrics = label_propagation(spark, df, max_iter=30)
    got = {r["v"]: r["label"] for r in labels.collect()}
    # labels never cross components
    comp_of = {v: (0 if v < 100 else 100) for v in got}
    label_comp = {}
    for v, lab in got.items():
        label_comp.setdefault(lab, set()).add(comp_of[v])
    for lab, comps in label_comp.items():
        assert len(comps) == 1
    # deterministic: rerun gives identical labels
    labels2, _ = label_propagation(spark, df, max_iter=30)
    got2 = {r["v"]: r["label"] for r in labels2.collect()}
    assert got == got2


def test_lpa_semi_converges_on_bipartite(spark):
    """Synchronous LPA 2-cycles on bipartite structures (documented);
    semi-synchronous mode must reach a fixpoint instead."""
    from adopt_spark.algos.lpa import label_propagation

    # single edge: the canonical oscillator
    one = spark.createDataFrame([(1, 2)], "sid long, tid long")
    labels, metrics = label_propagation(spark, one, max_iter=10, mode="semi")
    assert metrics[-1]["changed"] == 0          # fixpoint reached
    assert {r["label"] for r in labels.collect()} == {2} or \
           {r["label"] for r in labels.collect()} == {1}
    # bipartite star K_{1,4}
    star = spark.createDataFrame([(0, i) for i in range(1, 5)],
                                 "sid long, tid long")
    labels2, metrics2 = label_propagation(spark, star, max_iter=10, mode="semi")
    assert metrics2[-1]["changed"] == 0
    assert len({r["label"] for r in labels2.collect()}) == 1
    # deterministic across runs
    labels3, _ = label_propagation(spark, star, max_iter=10, mode="semi")
    assert {(r["v"], r["label"]) for r in labels2.collect()} == \
           {(r["v"], r["label"]) for r in labels3.collect()}


def test_lpa_bad_mode(spark):
    import pytest as _pytest

    from adopt_spark.algos.lpa import label_propagation

    one = spark.createDataFrame([(1, 2)], "sid long, tid long")
    with _pytest.raises(ValueError, match="mode"):
        label_propagation(spark, one, mode="nope")


def test_lpa_semi_negative_ids(spark):
    """pmod parity: negative odd ids must still update in semi mode."""
    from adopt_spark.algos.lpa import label_propagation

    edges = spark.createDataFrame(
        [(-10, -8), (-10, -6), (-8, -6), (-10, -3)], "sid long, tid long")
    labels, metrics = label_propagation(spark, edges, max_iter=10, mode="semi")
    assert metrics[-1]["changed"] == 0
    got = {r["v"]: r["label"] for r in labels.collect()}
    # one community — vertex -3 must NOT be frozen at its own label
    assert len(set(got.values())) == 1, got


def test_cc_delta_equals_star(spark, powerlaw_small):
    """Delta-frontier min-propagation must produce byte-identical
    labels to the star method, including through the contraction
    fallback (tiny cap) and on negative / non-int32 ids."""
    df, pairs = powerlaw_small
    star = {(r.v, r.component)
            for r in connected_components(spark, df, method="star")[0].collect()}
    delta = {(r.v, r.component)
             for r in connected_components(spark, df, method="delta")[0].collect()}
    capped = {(r.v, r.component)
              for r in connected_components(
                  spark, df, method="delta", delta_rounds_cap=1)[0].collect()}
    assert star == delta == capped

    wide = spark.createDataFrame(
        [(-5, -3), (-3, 2), (10**10, 10**10 + 1), (2, 10**10)],
        "sid long, tid long")
    s = {(r.v, r.component)
         for r in connected_components(spark, wide, method="star")[0].collect()}
    d = {(r.v, r.component)
         for r in connected_components(spark, wide, method="delta")[0].collect()}
    assert s == d
    # schema stays long regardless of internal int narrowing
    lab, _ = connected_components(spark, df, method="delta")
    assert [f.dataType.simpleString() for f in lab.schema.fields] == \
        ["bigint", "bigint"]


def test_cc_bad_method(spark):
    import pytest as _pytest

    one = spark.createDataFrame([(1, 2)], "sid long, tid long")
    with _pytest.raises(ValueError, match="method"):
        connected_components(spark, one, method="nope")


def test_lpa_delta_equals_sync(spark, powerlaw_small):
    """Frontier-recompute LPA must equal sync LPA at the same round
    count (identical votes, identical tie-breaks)."""
    df, pairs = powerlaw_small
    for iters in (1, 3, 6):
        sy = {(r.v, r.label)
              for r in label_propagation(spark, df, max_iter=iters)[0].collect()}
        de = {(r.v, r.label)
              for r in label_propagation(
                  spark, df, max_iter=iters, mode="delta")[0].collect()}
        assert sy == de, iters


def test_directed_modularity_vs_python(spark):
    from adopt_spark.algos.lpa import directed_modularity

    # two dense blobs {0..3} and {10..13} with two cross links
    pairs = [(a, b) for a in range(4) for b in range(4) if a != b]
    pairs += [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    pairs += [(0, 10), (11, 1)]
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    labels = spark.createDataFrame(
        [(v, 0) for v in range(4)] + [(v, 1) for v in range(10, 14)],
        "v long, label long")
    row = directed_modularity(edges, labels).collect()[0]

    m = len(set(pairs))
    within = sum(1 for a, b in set(pairs)
                 if (a < 4) == (b < 4))
    outd, ind = {}, {}
    for a, b in set(pairs):
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    q = within / m
    for lab in (range(4), range(10, 14)):
        dout = sum(outd.get(v, 0) for v in lab)
        din = sum(ind.get(v, 0) for v in lab)
        q -= dout * din / (m * m)
    assert row.n_edges == m and row.n_communities == 2
    assert row.modularity == round(q, 6)
    # perfect split without the cross links ~ higher modularity
    assert row.modularity > 0.3


def test_cc_incremental_matches_full_recompute(spark):
    """Randomized base/delta splits: the contraction-merge labels must
    equal a from-scratch union-find on base+delta, including delta-only
    vertices and min-id component naming."""
    import numpy as np

    from adopt_spark.algos.cc import cc_incremental

    rng = np.random.default_rng(17)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 40, size=(45, 2))
                    if a != b})
    # delta includes brand-new vertices 100..103 bridging components
    delta = [(0, 100), (100, 101), (25, 102), (102, 103), (5, 30)]
    base = [p for p in pairs if p not in set(delta)]

    labels, stats = cc_incremental(
        spark, edge_df(spark, base), edge_df(spark, delta))
    got = {(r.v, r.component) for r in labels.collect()}

    allp = base + delta
    verts = sorted({x for p in allp for x in p})
    parent = {v: v for v in verts}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in allp:
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {(v, comp_min[find(v)]) for v in verts}
    assert got == want
    assert stats["contracted_edges"] >= 1


def test_cc_incremental_noop_delta(spark):
    from adopt_spark.algos.cc import cc_incremental

    base = [(0, 1), (1, 2), (10, 11)]
    # delta edge inside an existing component + an isolated new pair
    delta = [(0, 2), (50, 51)]
    labels, stats = cc_incremental(
        spark, edge_df(spark, base), edge_df(spark, delta))
    got = {(r.v, r.component) for r in labels.collect()}
    want = {(0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (50, 50), (51, 50)}
    assert got == want


def test_streaming_cc_matches_batch_and_is_split_invariant(spark):
    import numpy as np
    from collections import Counter

    from adopt_spark.streaming.graph_stream import streaming_cc_sizes

    rng = np.random.default_rng(23)
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 60, size=(70, 2))
                    if a != b})
    e = edge_df(spark, pairs)
    got4 = {(r.component, r.size)
            for r in streaming_cc_sizes(spark, e, n_batches=4).collect()}
    got1 = {(r.component, r.size)
            for r in streaming_cc_sizes(spark, e, n_batches=1).collect()}

    verts = sorted({x for p in pairs for x in p})
    parent = {v: v for v in verts}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for v in verts:
        comp_min.setdefault(find(v), v)
        comp_min[find(v)] = min(comp_min[find(v)], v)
    sizes = Counter(comp_min[find(v)] for v in verts)
    want = set(sizes.items())
    assert got4 == got1 == want


def test_percolation_profile_vs_python(spark, powerlaw_small):
    """Gate + CC replayed in python (union-find) per level."""
    from adopt_spark.algos.cc import percolation_profile
    from adopt_spark.algos.triangles import DOULION_A, DOULION_B, DOULION_M

    df, pairs = powerlaw_small
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    def level(p):
        samp = [(a, b) for a, b in und
                if ((a * DOULION_A + b * DOULION_B) % DOULION_M) % 100 < p]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in samp:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for v in {x for e in samp for x in e}:
            comps.setdefault(find(v), []).append(v)
        sizes = [len(vs) for vs in comps.values()]
        return (len(samp), sum(sizes), len(sizes),
                max(sizes) if sizes else 0)

    got = {r.p_pct: (r.n_edges, r.n_vertices, r.n_components, r.largest)
           for r in percolation_profile(spark, df, ps=(40, 80)).collect()}
    assert got == {40: level(40), 80: level(80)}
    # monotonicity: more surviving edges -> fewer, larger components
    assert got[80][0] > got[40][0]
    assert got[80][3] >= got[40][3]


def test_lpa_mixing_two_cliques(spark):
    """Two K5s + one bridge: diagonal mass = 2x10 internal edges, one
    off-diagonal cell with the bridge."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 10, b + 10) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k5a + k5b + [(0, 10)],
                               "sid long, tid long")
    with mock.patch.object(R, "derived_edges_sparse",
                           lambda s_, sf: df):
        got = {(r.label_a, r.label_b): r.n_edges
               for r in R.q_lpa_mixing(spark, "x").collect()}
    diag = {k: v for k, v in got.items() if k[0] == k[1]}
    off = {k: v for k, v in got.items() if k[0] != k[1]}
    assert sorted(diag.values()) == [10, 10]
    assert sum(off.values()) == 1


def test_cc_delta_checkpoint_cadence(spark, tmp_path):
    """Round-5 checkpoint contract: round 0 and every 4th live round
    write a durable FULL snapshot (phase delta_full — the only resume
    points); near-full-frontier rounds record lineage/metrics without
    a durable write (delta_mem); small-frontier rounds write O(changed)
    deltas (delta_inc). Every superstep must have a metrics record."""
    import json
    import os

    # path graph: diameter 30 forces many delta rounds
    pairs = [(i, i + 1) for i in range(30)]
    ckpt = str(tmp_path / "cc_cadence")
    labels, metrics = connected_components(
        spark, edge_df(spark, pairs), method="delta",
        checkpoint_dir=ckpt, delta_rounds_cap=20)
    assert {r["component"] for r in labels.collect()} == {0}

    with open(os.path.join(ckpt, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    phases = {r["iteration"]: r.get("phase") for r in recs}
    assert phases[0] == "delta_full"
    live = [r["iteration"] for r in recs if r["iteration"] > 0]
    # every live superstep recorded, in order, no gaps
    assert live == list(range(1, max(live) + 1))
    # periodic full snapshots: iterations 4, 8, ... are delta_full
    fulls = sorted(i for i, p in phases.items() if p == "delta_full")
    assert fulls[0] == 0
    assert all(i % 4 == 0 for i in fulls[1:3]) and len(fulls) >= 2
    # the non-durable records carry lineage + the changed sum
    mems = [r for r in recs if r.get("phase") == "delta_mem"]
    for r in mems:
        assert r["path"] is None and r["durable"] is False
        assert r["partitions"] and "changed" in r["sums"]
    # durable dirs on disk are only the saved iterations
    on_disk = {int(n.split("=")[1]) for n in os.listdir(ckpt)
               if n.startswith("iter=")}
    assert all(phases[i] != "delta_mem" for i in on_disk)
