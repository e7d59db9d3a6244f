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
