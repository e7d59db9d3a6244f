"""Deterministic random walks vs a pure-python replay."""

from __future__ import annotations

from adopt_spark.algos.walks import (
    MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M, random_walks,
)


def py_walks(pairs, length):
    adj: dict[int, list[int]] = {}
    for a, b in sorted(set(pairs)):
        if a != b:
            adj.setdefault(a, []).append(b)
    for v in adj:
        adj[v] = sorted(set(adj[v]))
    rows = set()
    for start in adj:
        cur = start
        rows.add((start, 0, start))
        for step in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            mix = (MIX_A1 * start + MIX_A2 * step + MIX_A3 * cur + MIX_B) % MIX_M
            cur = nbrs[mix % len(nbrs)]
            rows.add((start, step, cur))
    return rows


def _got(df):
    return {(int(r["walk_id"]), int(r["step"]), int(r["v"]))
            for r in df.collect()}


def test_walks_powerlaw(spark, powerlaw_small):
    edges, pairs = powerlaw_small
    assert _got(random_walks(spark, edges, length=6)) == py_walks(pairs, 6)


def test_walks_truncate_at_dangling(spark):
    pairs = [(0, 1), (1, 2)]  # 2 is a sink
    edges = spark.createDataFrame(pairs, "sid long, tid long")
    got = _got(random_walks(spark, edges, length=5))
    assert got == py_walks(pairs, 5)
    assert max(s for (_, s, _) in got) == 2  # walk from 0 ends at vertex 2


def test_walks_deterministic_across_parallelism(spark, powerlaw_small):
    edges, _ = powerlaw_small
    a = _got(random_walks(spark, edges, length=4, num_partitions=2))
    b = _got(random_walks(spark, edges, length=4, num_partitions=16))
    assert a == b
