"""The generic Pregel API, held differentially to the hand-written
algorithms it generalizes (round-3 session-12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.paths import shortest_paths
from adopt_spark.algos.pregel import (
    Pregel, pregel_cc, pregel_degree, pregel_sssp,
)


def _edges(spark, pairs, weights=None):
    if weights is None:
        return spark.createDataFrame(pairs, "sid long, tid long")
    rows = [(s, t, w) for (s, t), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, "sid long, tid long, w long")


def _rand_graph(n=120, m=300, seed=5):
    x, pairs = seed, []
    for _ in range(m):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = x % n
        x = (x * 1103515245 + 12345) % (1 << 31)
        t = x % n
        if s != t:
            pairs.append((s, t))
    return sorted(set(pairs))


def test_pregel_cc_matches_star_contraction(spark):
    pairs = _rand_graph()
    e = _edges(spark, pairs)
    state, metrics = pregel_cc(e).run(spark, max_iter=50)
    got = {r.v: r.label for r in state.collect()}
    want_df, _ = connected_components(spark, e)
    want = {r.v: r.component for r in want_df.collect()}
    assert got == want
    assert metrics[-1]["changed"] is False  # halted on fixpoint


def test_pregel_sssp_matches_frontier_relaxation(spark):
    pairs = _rand_graph(n=80, m=200, seed=9)
    weights = [1 + (s * 7 + t * 13) % 10 for s, t in pairs]
    e = _edges(spark, pairs, weights)
    state, _ = pregel_sssp(e, source=0).run(spark, max_iter=100)
    got = {r.v: r.dist for r in state.collect() if r.dist is not None}

    # the hand-written SSSP uses its own contract weight; rebuild the
    # same weighted relation through a python Dijkstra instead
    import heapq
    adj: dict[int, list] = {}
    for (s, t), w in zip(pairs, weights):
        adj.setdefault(s, []).append((t, w))
    dist, pq = {0: 0}, [(0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for t, w in adj.get(u, []):
            if d + w < dist.get(t, 1 << 60):
                dist[t] = d + w
                heapq.heappush(pq, (d + w, t))
    assert got == dist


def test_pregel_hop_bfs_matches_shortest_paths(spark):
    pairs = _rand_graph(n=60, m=150, seed=3)
    e = _edges(spark, pairs, [1] * len(pairs))
    state, _ = pregel_sssp(e, source=1).run(spark, max_iter=60)
    got = {r.v: r.dist for r in state.collect() if r.dist is not None}
    want_df, _ = shortest_paths(spark, e.select("sid", "tid"), 1,
                                weighted=False, directed=True)
    want = {r.v: r.dist for r in want_df.collect()}
    assert got == want


def test_pregel_degree_one_superstep(spark):
    pairs = _rand_graph(n=40, m=100, seed=7)
    e = _edges(spark, pairs)
    state, _ = pregel_degree(e).run(spark, max_iter=1,
                                    halt_on_fixpoint=False)
    got = {r.v: r.deg for r in state.collect()}
    want: dict[int, int] = {}
    for s, t in pairs:
        want[s] = want.get(s, 0) + 1
        want[t] = want.get(t, 0) + 1
    assert got == want


def test_pregel_resume_continues_mid_algorithm(spark, tmp_path):
    pairs = [(i, i + 1) for i in range(30)]  # a path: slow hash-min
    e = _edges(spark, pairs)
    full, _ = pregel_cc(e).run(spark, max_iter=50,
                               checkpoint_dir=str(tmp_path / "full"))

    part_dir = str(tmp_path / "part")
    pregel_cc(e).run(spark, max_iter=4, checkpoint_dir=part_dir)
    resumed, metrics = pregel_cc(e).run(spark, max_iter=50,
                                        checkpoint_dir=part_dir,
                                        resume=True)
    assert metrics[0]["iteration"] == 4  # picked up after the snapshot
    assert sorted(map(tuple, resumed.collect())) == \
        sorted(map(tuple, full.collect()))


def test_pregel_builder_validation(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        Pregel(e.select(F.col("sid").alias("x"), "tid"))
    with pytest.raises(ValueError):
        Pregel(e).run(spark)  # no vertex column
    p = Pregel(e).with_vertex_column("z", F.lit(0), F.lit(0))
    with pytest.raises(ValueError):
        p.run(spark)  # no sends
    p = p.send_to_dst(F.lit(1))
    with pytest.raises(ValueError):
        p.run(spark)  # no agg


def test_pregel_skips_dst_join_when_unreferenced(spark):
    # send expr references only src state -> the dst-state join must
    # be absent from the plan (one state join per superstep, not two)
    e = _edges(spark, [(0, 1), (1, 2)])
    p = pregel_sssp(e.withColumn("w", F.lit(1)), source=0)
    assert p._needs_dst_state() is False
    assert pregel_cc(e)._needs_dst_state() is True


def test_pregel_pagerank_matches_production_engine(spark):
    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.pregel import pregel_pagerank

    # dangling-free graph: close every sink back to vertex 0
    pairs = set(_rand_graph(n=50, m=160, seed=21))
    vs = {v for p in pairs for v in p}
    sinks = vs - {s for s, _ in pairs}
    pairs |= {(v, 0) for v in sinks if v != 0}
    e = _edges(spark, sorted(pairs))

    n_iter = 12
    state, _ = pregel_pagerank(e, n_vertices=len(vs)).run(
        spark, max_iter=n_iter, halt_on_fixpoint=False)
    got = {r.v: r.rank for r in state.collect()}

    want_df, _ = pagerank(spark, e, tol=0.0, max_iter=n_iter)
    want = {r.v: r.rank for r in want_df.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pregel_pagerank_full_handles_dangling_and_l1_halt(spark):
    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.pregel import pregel_pagerank_full

    pairs = _rand_graph(n=40, m=110, seed=33)   # has sinks (dangling)
    e = _edges(spark, pairs)
    sinks = {v for p in pairs for v in p} - {s for s, _ in pairs}
    assert sinks  # the fixture genuinely exercises dangling mass

    n_iter = 10
    _, run = pregel_pagerank_full(e, tol=0.0)
    state, metrics = run(spark, max_iter=n_iter,
                         stop_when=lambda g: False)
    got = {r.v: r.rank for r in state.collect()}

    want_df, _ = pagerank(spark, e, tol=0.0, max_iter=n_iter)
    want = {r.v: r.rank for r in want_df.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # globals surfaced per superstep
    assert "d_mass" in metrics[-1]["globals"]


def test_pregel_pagerank_full_l1_stop_matches_production_count(spark):
    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.pregel import pregel_pagerank_full

    pairs = _rand_graph(n=30, m=80, seed=41)
    e = _edges(spark, pairs)
    tol = 1e-8
    _, run = pregel_pagerank_full(e, tol=tol)
    state, metrics = run(spark, max_iter=100)
    got = {r.v: r.rank for r in state.collect()}
    assert metrics[-1]["globals"]["l1"] <= tol
    assert len(metrics) < 100  # actually converged, not exhausted

    want_df, _ = pagerank(spark, e, tol=tol, max_iter=100)
    want = {r.v: r.rank for r in want_df.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
