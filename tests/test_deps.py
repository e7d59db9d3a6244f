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


# ---------------------------------- dependency-graph analytics


def _py_khop(edges, k):
    """Independent bounded-hop reachability: distinct (root, v),
    1 <= hops <= k, v != root (plain BFS per root)."""
    adj = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
    verts = sorted({s for s, _ in edges} | {t for _, t in edges})
    pairs = set()
    for root in verts:
        frontier = {root}
        seen = set()
        for _ in range(k):
            frontier = {t for v in frontier for t in adj.get(v, ())} \
                - seen - {root}
            if not frontier:
                break
            seen |= frontier
        pairs |= {(root, v) for v in seen}
    return verts, pairs


def _edge_str_df(spark, edges):
    return spark.createDataFrame(
        [(s, t) for s, t in edges], "src string, dst string")


def test_dep_impact_vs_python_bfs(spark):
    from adopt_spark.functions.deps import dep_impact

    rng = np.random.default_rng(11)
    edges = sorted({(f"n{int(rng.integers(0, 30))}",
                     f"n{int(rng.integers(0, 30))}")
                    for _ in range(70)})
    edges = [(s, t) for s, t in edges if s != t]
    for k in (1, 2, 3):
        got = {r.repo: (r.n_deps, r.n_dependents)
               for r in dep_impact(_edge_str_df(spark, edges), k).collect()}
        verts, pairs = _py_khop(edges, k)
        want = {v: (sum(1 for r, _ in pairs if r == v),
                    sum(1 for _, w in pairs if w == v)) for v in verts}
        assert got == want, f"k={k}"


def test_dep_impact_hop_boundary(spark):
    """Chain a->b->c->d: at k=2 a reaches {b,c} only; d's dependents
    at k=2 are {b,c} only."""
    from adopt_spark.functions.deps import dep_impact

    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = {r.repo: (r.n_deps, r.n_dependents)
           for r in dep_impact(_edge_str_df(spark, edges), 2).collect()}
    assert got == {"a": (2, 0), "b": (2, 1), "c": (1, 2), "d": (0, 2)}


def test_dep_impact_cycle_terminates(spark):
    """A 3-cycle: every vertex reaches the other two (never itself),
    even with max_hops far beyond the cycle length."""
    from adopt_spark.functions.deps import dep_impact

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = {r.repo: (r.n_deps, r.n_dependents)
           for r in dep_impact(_edge_str_df(spark, edges), 10).collect()}
    assert got == {v: (2, 2) for v in "abc"}


def test_dep_outdated_classification(spark):
    from adopt_spark.functions.deps import dep_outdated

    rels = [("d", 2, 3, 4), ("d", 1, 0, 0), ("e", 0, 1, 1)]
    resolved = [
        ("r1", "d", "x", "2.3.4", 1),   # current
        ("r1", "d", "x2", "2.3.1", 1),  # patch_behind
        ("r1", "d", "x3", "2.1.0", 1),  # minor_behind
        ("r1", "d", "x4", "1.0.0", 1),  # major_behind
        ("r1", "e", "x5", None, 0),     # unresolved
        ("r2", "e", "x6", "0.1.1", 1),  # current
    ]
    rdf = spark.createDataFrame(
        resolved,
        "repo string, dep string, spec string, resolved string, "
        "n_candidates long")
    reldf = spark.createDataFrame(
        rels, "dep string, maj long, minor long, patch long")
    got = {r.repo: r.asDict() for r in dep_outdated(rdf, reldf).collect()}
    assert got["r1"] == {
        "repo": "r1", "n_reqs": 5, "n_current": 1, "n_patch_behind": 1,
        "n_minor_behind": 1, "n_major_behind": 1, "n_unresolved": 1}
    assert got["r2"]["n_current"] == 1 and got["r2"]["n_reqs"] == 1


def test_dep_conflicts_diamond(spark):
    """root -> a, root -> b; a pins libX 1.0.0, b pins libX 2.0.0:
    the classic diamond. Also checks version-key ordering (10.0.0
    must beat 2.0.0 as 'highest')."""
    from adopt_spark.functions.deps import dep_conflicts

    # ownership map: libJ -> repo((J*53+17) % 211); choose libs owned
    # by distinct repos: lib1 -> repo70, lib2 -> repo123
    resolved = [
        ("root", "lib1", "s", "1.0.0", 1),   # edge root -> repo70
        ("root", "lib2", "s", "1.0.0", 1),   # edge root -> repo123
        ("repo70", "lib9", "s", "2.0.0", 1),
        ("repo123", "lib9", "s", "10.0.0", 1),
    ]
    rdf = spark.createDataFrame(
        resolved,
        "repo string, dep string, spec string, resolved string, "
        "n_candidates long")
    rows = dep_conflicts(rdf, max_hops=2).collect()
    by_key = {(r.repo, r.dep): r for r in rows}
    diamond = by_key[("root", "lib9")]
    assert diamond.n_versions == 2
    assert diamond.lowest == "2.0.0" and diamond.highest == "10.0.0"
    # the two mid repos only see their own pin — no conflict rows
    assert not any(r.repo in ("repo70", "repo123") for r in rows)


def test_dep_conflicts_none_when_consistent(spark):
    from adopt_spark.functions.deps import dep_conflicts

    resolved = [
        ("root", "lib1", "s", "1.0.0", 1),
        ("repo70", "lib2", "s", "1.0.0", 1),   # same version everywhere
        ("root", "lib2", "s", "1.0.0", 1),
    ]
    rdf = spark.createDataFrame(
        resolved,
        "repo string, dep string, spec string, resolved string, "
        "n_candidates long")
    assert dep_conflicts(rdf, max_hops=3).count() == 0


def test_license_exposure_vs_python(spark):
    """Diamond fixture: root's closure unions licenses from every
    branch; the law is replayed in python."""
    from adopt_spark.functions.deps import (
        _LICENSES, _RESTRICTIVE, license_exposure,
    )

    edges = [("repo1", "repo2"), ("repo1", "repo3"),
             ("repo2", "repo4"), ("repo3", "repo4"),
             ("repo4", "repo5"), ("repo9", "repo1")]
    df = spark.createDataFrame(edges, "src string, dst string")

    def lic(r):
        return _LICENSES[(int(r[4:]) * 31 + 7) % 5]

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    verts = {v for e in edges for v in e}

    def closure(root, hops):
        seen, frontier = set(), {root}
        for _ in range(hops):
            frontier = {d for v in frontier for d in adj.get(v, ())} \
                - seen - {root}
            if not frontier:
                break
            seen |= frontier
        return seen

    want = {}
    for r in verts:
        mem = {r} | closure(r, 3)
        ls = sorted({lic(m) for m in mem})
        want[r] = (len(mem), len(ls), ",".join(ls),
                   sum(1 for m in mem if lic(m) in _RESTRICTIVE))
    got = {r.repo: (r.n_repos, r.n_licenses, r.licenses, r.n_restrictive)
           for r in license_exposure(df, max_hops=3).collect()}
    assert got == want


def test_license_exposure_clean_leaf(spark):
    """A leaf repo's exposure is exactly its own license."""
    from adopt_spark.functions.deps import license_exposure, repo_license
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("repo7", "repo8")],
                               "src string, dst string")
    rows = {r.repo: r for r in license_exposure(df).collect()}
    own = spark.range(1).select(
        repo_license(F.lit("repo8")).alias("l")).collect()[0].l
    assert rows["repo8"].n_repos == 1
    assert rows["repo8"].licenses == own


def test_pagerank_deps_pipeline_smoke(spark):
    """North-star pipeline composition on sf0.001: manifests ->
    lockfile -> dep edges -> PageRank; ranks are a probability
    vector and hub repos outrank leaves."""
    from pyspark.sql import functions as F

    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.functions.deps import (
        dep_edges, semver_resolve, synthetic_releases,
        synthetic_requirements,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    resolved = semver_resolve(synthetic_requirements(orders, thin=13),
                              synthetic_releases(part))
    e = dep_edges(resolved)
    ids = e.select(
        F.regexp_extract("src", r"([0-9]+)$", 1).cast("long").alias("sid"),
        F.regexp_extract("dst", r"([0-9]+)$", 1).cast("long").alias("tid"))
    ranks, metrics = pagerank(spark, ids, tol=0.0, max_iter=5)
    rows = ranks.collect()
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
    assert len(rows) == ids.select("sid").union(ids.select("tid")) \
        .distinct().count()


def test_dep_islands_two_universes(spark):
    """The q_dep_islands composition (string repos -> numeric ids ->
    CC -> sizes) on two disjoint dep universes."""
    # two disjoint dep universes: {1->2->3} and {10->11}
    e = spark.createDataFrame(
        [("repo1", "repo2"), ("repo2", "repo3"), ("repo10", "repo11")],
        "src string, dst string")
    from adopt_spark.algos.cc import connected_components
    from pyspark.sql import functions as F

    ids = e.select(
        F.regexp_extract("src", r"([0-9]+)$", 1).cast("long").alias("sid"),
        F.regexp_extract("dst", r"([0-9]+)$", 1).cast("long").alias("tid"))
    labels, _ = connected_components(spark, ids)
    got = {r.component: r.n for r in
           labels.groupBy("component")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {1: 3, 10: 2}


def test_pref_attachment_planted_rich_get_richer(spark):
    """Hub gains many new partners in half 2, leaves gain none ->
    strong positive correlation."""
    import datetime

    from unittest import mock

    from adopt_spark.queries import registry as R

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0

    def contact(u, v, hour):
        nonlocal eid
        for uid in (u, v):
            rows.append((eid, t0 + datetime.timedelta(hours=hour),
                         uid, "m", 1.0))
            eid += 1

    # half 1 (hours 0-9): hub 0 meets 1..5; pair (20, 21) meets
    for i in range(1, 6):
        contact(0, i, i)
    contact(20, 21, 2)
    # half 2 (hours 11-19): hub 0 meets 6..10 (new); 20/21 meet again
    for i in range(6, 11):
        contact(0, i, 10 + i - 5)
    contact(20, 21, 15)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        row = R.q_pref_attachment(spark, "x").collect()[0]
    assert row.n_vertices >= 2
    assert row.slope > 0          # degree-proportional gains
