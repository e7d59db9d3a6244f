"""k-core decomposition vs a pure-python peeling oracle."""

from adopt_spark.algos.kcore import core_numbers, k_core


def py_core_numbers(pairs) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {v: 0 for v in adj}
    k = 1
    live = {v: set(ns) for v, ns in adj.items()}
    while live:
        changed = True
        while changed:
            changed = False
            for v in list(live):
                if len(live[v]) < k:
                    for u in live[v]:
                        live[u].discard(v)
                    del live[v]
                    changed = True
        for v in live:
            core[v] = k
        k += 1
    return core


def test_core_numbers_powerlaw(spark, powerlaw_small):
    df, pairs = powerlaw_small
    expected = py_core_numbers(pairs)
    got = {r["v"]: r["core"] for r in core_numbers(spark, df).collect()}
    assert got == expected


def test_k_core_star(spark, star_hub):
    df, pairs = star_hub
    # a star has no 2-core
    assert k_core(spark, df, 2).count() == 0
    expected = {v for v, c in py_core_numbers(pairs).items() if c >= 1}
    got = {r["v"] for r in k_core(spark, df, 1).collect()}
    assert got == expected


def test_k_core_triangle(spark, tri6):
    df, pairs = tri6
    got2 = {r["v"] for r in k_core(spark, df, 2).collect()}
    expected2 = {v for v, c in py_core_numbers(pairs).items() if c >= 2}
    assert got2 == expected2


def _py_onion(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    out = {}
    k, layer = 1, 0
    while alive:
        low = {v for v in alive if len(adj[v] & alive) < k}
        if not low:
            k += 1
            continue
        layer += 1
        for v in low:
            out[v] = (k - 1, layer)
        alive -= low
    return out


def test_onion_layers_vs_python_peel(spark):
    import itertools

    import numpy as np

    from adopt_spark.algos.kcore import onion_layers

    rng = np.random.default_rng(5)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, 40, size=(160, 2))
                    if a != b})
    pairs += list(itertools.combinations(range(100, 106), 2))  # planted K6
    pairs = sorted(set(pairs))
    df = spark.createDataFrame(pairs, "sid long, tid long")
    got = {r.v: (r.core, r.layer) for r in onion_layers(spark, df).collect()}
    assert got == _py_onion(pairs)


def test_onion_layers_refine_core_numbers(spark):
    """Onion layers must be consistent with core numbers (same core
    per vertex) and strictly increase across batches of the same
    stage."""
    import numpy as np

    from adopt_spark.algos.kcore import core_numbers, onion_layers

    rng = np.random.default_rng(9)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, 30, size=(90, 2))
                    if a != b})
    df = spark.createDataFrame(pairs, "sid long, tid long")
    on = {r.v: (r.core, r.layer) for r in onion_layers(spark, df).collect()}
    cn = {r.v: r.core for r in core_numbers(spark, df).collect()}
    assert {v: c for v, (c, _) in on.items()} == cn
    # layers are 1..L with no gaps
    layers = sorted({l for _, l in on.values()})
    assert layers == list(range(1, len(layers) + 1))


def test_onion_layers_path_and_clique(spark):
    """Path a-b-c-d: endpoints are layer 1 (deg 1 at k=1... actually
    deg>=1 so stage 2 peels ends first); K4: single batch."""
    import itertools

    from adopt_spark.algos.kcore import onion_layers

    k4 = list(itertools.combinations(range(4), 2))
    df = spark.createDataFrame(k4, "sid long, tid long")
    rows = onion_layers(spark, df).collect()
    assert {(r.core, r.layer) for r in rows} == {(3, 1)}
    assert len(rows) == 4


def test_core_community_two_planted_cores(spark):
    """3-core CC: two disjoint K4s survive the peel (each a
    component); trees and pendants peel away entirely."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a in range(4) for b in range(a + 1, 4)]
    tree = [(20, 21), (21, 22), (22, 23), (0, 20)]
    df = spark.createDataFrame(k4a + k4b + tree, "sid long, tid long")
    with mock.patch.object(R, "derived_edges_sparse",
                           lambda s_, sf: df):
        got = {r.component: r.size
               for r in R.q_core_community(spark, "x").collect()}
    assert got == {0: 4, 10: 4}
