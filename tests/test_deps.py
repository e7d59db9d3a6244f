"""Semver resolution (functions/deps.py) vs an independent pure-python
resolver, plus the per-directory rollup vs `collections.Counter`."""

from __future__ import annotations

import itertools
import re
from collections import Counter

import numpy as np
import pytest

from adopt_spark.functions.code import path_rollup
from adopt_spark.functions.deps import (
    semver_resolve,
    synthetic_releases,
    synthetic_requirements,
)

# ------------------------------------------------ python reference


def py_bounds(spec: str) -> tuple[int, int]:
    """Independent formulation: parse to (lo, hi) on the int64 key."""
    INF = 4_000_000_000
    m = re.match(r"^(\^|~|>=)?(.*)$", spec)
    op, rest = m.group(1) or "", m.group(2)
    if rest == "*":
        return 0, INF
    parts = rest.split(".")
    nums = [int(p) if p.isdigit() else None for p in parts] + [None] * 3
    maj, minor, patch = nums[0], nums[1], nums[2]
    key = maj * 10**6 + (minor or 0) * 10**3 + (patch or 0)
    if op == ">=":
        return key, INF
    if op == "^":
        if maj > 0:
            return key, (maj + 1) * 10**6
        if (minor or 0) > 0:
            return key, (minor + 1) * 10**3
        return key, key + 1
    if op == "~":
        return key, maj * 10**6 + ((minor or 0) + 1) * 10**3
    if minor is None:
        return maj * 10**6, (maj + 1) * 10**6
    if patch is None:
        return key, maj * 10**6 + (minor + 1) * 10**3
    return key, key + 1


def py_resolve(reqs, rels):
    """(repo, dep, spec) x {dep: [version keys]} -> resolved map."""
    by_dep: dict[str, list[int]] = {}
    for dep, mj, mi, pa in rels:
        by_dep.setdefault(dep, []).append(mj * 10**6 + mi * 10**3 + pa)
    out = {}
    for repo, dep, spec in reqs:
        lo, hi = py_bounds(spec)
        sat = [v for v in by_dep.get(dep, []) if lo <= v < hi]
        best = max(sat) if sat else None
        res = (f"{best // 10**6}.{(best // 10**3) % 1000}.{best % 1000}"
               if best is not None else None)
        out[(repo, dep, spec)] = (res, len(sat))
    return out


def _grammar_specs() -> list[str]:
    specs = ["*"]
    for maj, minor, patch in itertools.product((0, 1, 2), (0, 3), (0, 4)):
        mnp = f"{maj}.{minor}.{patch}"
        specs += [mnp, f"^{mnp}", f"~{mnp}", f">={mnp}",
                  f"{maj}.x", f"{maj}.{minor}.x", f"{maj}.{minor}"]
    return sorted(set(specs))


def test_semver_resolve_differential(spark):
    rng = np.random.default_rng(7)
    deps = [f"d{i}" for i in range(6)]
    rels = sorted({
        (deps[int(rng.integers(0, 6))], int(rng.integers(0, 3)),
         int(rng.integers(0, 8)), int(rng.integers(0, 5)))
        for _ in range(120)})
    specs = _grammar_specs()
    reqs = sorted({
        (f"r{int(rng.integers(0, 9))}", deps[int(rng.integers(0, 6))],
         specs[int(rng.integers(0, len(specs)))])
        for _ in range(150)})
    # plant guaranteed-unresolvable rows (unknown dep, impossible range)
    reqs += [("r0", "ghost", "*"), ("r1", deps[0], ">=3.9.9")]

    got = semver_resolve(
        spark.createDataFrame(reqs, "repo string, dep string, spec string"),
        spark.createDataFrame(
            rels, "dep string, maj long, minor long, patch long"),
    ).collect()
    want = py_resolve(reqs, rels)

    assert len(got) == len(set(reqs))
    for row in got:
        res, n = want[(row.repo, row.dep, row.spec)]
        assert (row.resolved, row.n_candidates) == (res, n), \
            (row.repo, row.dep, row.spec)
    assert any(r.resolved is None for r in got)  # unresolvables kept


def test_semver_partition_invariance(spark):
    rels = [("d", 1, 2, 3), ("d", 1, 9, 0), ("d", 2, 0, 0)]
    reqs = [("r", "d", "^1.0.0"), ("r", "d", "~1.2.0"), ("r", "d", "*")]
    rdf = spark.createDataFrame(
        reqs, "repo string, dep string, spec string")
    reldf = spark.createDataFrame(
        rels, "dep string, maj long, minor long, patch long")
    a = sorted(map(tuple, semver_resolve(
        rdf.repartition(1), reldf.repartition(1)).collect()))
    b = sorted(map(tuple, semver_resolve(
        rdf.repartition(7), reldf.repartition(5)).collect()))
    assert a == b == [
        ("r", "d", "*", "2.0.0", 3),
        ("r", "d", "^1.0.0", "1.9.0", 2),
        ("r", "d", "~1.2.0", "1.2.3", 1),
    ]


def test_semver_caret_zero_major(spark):
    """npm caret narrows below 1.0.0: ^0.2.1 admits 0.2.x>=1 only,
    ^0.0.3 admits exactly 0.0.3."""
    rels = [("d", 0, 2, 1), ("d", 0, 2, 9), ("d", 0, 3, 0),
            ("d", 0, 0, 3), ("d", 0, 0, 4)]
    reqs = [("r", "d", "^0.2.1"), ("r", "d", "^0.0.3")]
    got = {r.spec: (r.resolved, r.n_candidates) for r in semver_resolve(
        spark.createDataFrame(reqs, "repo string, dep string, spec string"),
        spark.createDataFrame(
            rels, "dep string, maj long, minor long, patch long"),
    ).collect()}
    assert got == {"^0.2.1": ("0.2.9", 2), "^0.0.3": ("0.0.3", 1)}


def test_synthetic_fixtures_deterministic(spark):
    sf = "/root/testdata/sf0.001"
    part = spark.read.parquet(f"{sf}/part.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    r1 = sorted(map(tuple, synthetic_releases(part).collect()))
    r2 = sorted(map(tuple, synthetic_releases(part).collect()))
    assert r1 == r2 and len(r1) > 0
    q = sorted(map(tuple, synthetic_requirements(orders).collect()))
    assert len(q) > 0
    kinds = {re.match(r"^(\^|~|>=|\*)?", s).group(1) or "plain"
             for _, _, s in q}
    assert {"^", "~", ">=", "*", "plain"} <= kinds


# ------------------------------------------------------ path rollup


def test_path_rollup_vs_counter(spark):
    docs = spark.createDataFrame(
        [(i, f"l{i % 3}", 10 + i) for i in range(200)],
        "doc_id long, lang string, n_chars long")
    got = {r.dir: (r.depth, r.n_files, r.total_chars)
           for r in path_rollup(docs).collect()}

    files = Counter()
    chars = Counter()
    for i in range(200):
        path = f"src/l{i % 3}/m{i % 23}/f_{i}.txt"
        segs = path.split("/")
        for d in range(1, len(segs)):
            pre = "/".join(segs[:d])
            files[pre] += 1
            chars[pre] += 10 + i
    assert set(got) == set(files)
    for pre in files:
        depth = pre.count("/") + 1
        assert got[pre] == (depth, files[pre], chars[pre]), pre
    assert got["src"] == (1, 200, sum(10 + i for i in range(200)))
