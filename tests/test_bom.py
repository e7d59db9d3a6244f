"""BOM explosion (functions/bom.py) vs an independent recursive
python reference (path-enumerating, so any pair-aggregation bug in
the DP shows up as a sum/count mismatch)."""

from __future__ import annotations

import numpy as np

from adopt_spark.functions.bom import bom_explode


def _py_explode(rows):
    """Enumerate every path (the thing the engine must NEVER do) and
    aggregate sums/counts per (root, part)."""
    out: dict[tuple[int, int], list[int]] = {}
    children: dict[int, list[tuple[int, int]]] = {}
    for a, c, q in rows:
        children.setdefault(a, []).append((c, q))

    def walk(root, node, qty):
        for c, q in children.get(node, ()):  # DAG: terminates
            key = (root, c)
            agg = out.setdefault(key, [0, 0])
            agg[0] += qty * q
            agg[1] += 1
            walk(root, c, qty * q)

    for a in children:
        walk(a, a, 1)
    return {k: tuple(v) for k, v in out.items()}


def _bom_df(spark, rows):
    return spark.createDataFrame(
        [(int(a), int(c), int(q)) for a, c, q in rows],
        "assembly long, component long, qty long")


def test_bom_explode_vs_path_enumeration(spark):
    rng = np.random.default_rng(13)
    # random DAG: edges only go upward in key order (acyclic)
    rows = sorted({(int(a), int(a + 1 + rng.integers(0, 6)),
                    int(rng.integers(1, 4)))
                   for a in rng.integers(0, 25, size=80)})
    got = {(r.root, r.part): (r.total_qty, r.n_paths)
           for r in bom_explode(_bom_df(spark, rows), 40).collect()}
    assert got == _py_explode([(a, c, q) for a, c, q in rows])


def test_bom_explode_diamond_quantities(spark):
    """1 -> 2 (x2), 1 -> 3 (x1), 2 -> 3 (x3): part 3 under root 1
    totals 1 + 2*3 = 7 over 2 paths."""
    rows = [(1, 2, 2), (1, 3, 1), (2, 3, 3)]
    got = {(r.root, r.part): (r.total_qty, r.n_paths)
           for r in bom_explode(_bom_df(spark, rows)).collect()}
    assert got == {(1, 2): (2, 1), (1, 3): (7, 2), (2, 3): (3, 1)}


def test_bom_explode_deep_chain_early_stop(spark):
    """A 10-deep chain with qty 2 per level: root reaches depth d at
    total 2^d; max_levels beyond the depth early-stops (no empty-level
    work, correct totals)."""
    rows = [(i, i + 1, 2) for i in range(10)]
    got = {(r.root, r.part): (r.total_qty, r.n_paths)
           for r in bom_explode(_bom_df(spark, rows), 64).collect()}
    for d in range(1, 11):
        assert got[(0, d)] == (2 ** d, 1)
    assert len(got) == sum(range(1, 11))  # 10+9+...+1 reachable pairs


def test_bom_explode_level_cap_truncates(spark):
    rows = [(i, i + 1, 1) for i in range(5)]
    got = bom_explode(_bom_df(spark, rows), max_levels=2).collect()
    # only paths of length <= 2 counted
    assert {(r.root, r.part) for r in got} == \
        {(i, i + 1) for i in range(5)} | {(i, i + 2) for i in range(4)}
