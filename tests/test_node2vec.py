"""node2vec biased walks: python replica differential, uniform
degeneration, and bias-direction property."""

from __future__ import annotations

from collections import defaultdict

MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M = (
    2_654_435_761, 40_503, 2_246_822_519, 104_729, 2_147_483_647)


def _mix(wid, step, cur):
    return (MIX_A1 * wid + MIX_A2 * step + MIX_A3 * cur + MIX_B) % MIX_M


def _py_node2vec(pairs, length, wp, w1, wq):
    adj = defaultdict(list)
    for a, b in sorted({(a, b) for a, b in pairs if a != b}):
        adj[a].append(b)
    for v in adj:
        adj[v].sort()
    out = []
    for start in sorted(adj):
        prev, cur = None, start
        out.append((start, 0, start))
        for step in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            if step == 1:
                nxt = nbrs[_mix(start, step, cur) % len(nbrs)]
            else:
                pn = set(adj.get(prev, ()))
                w = [wp if x == prev else w1 if x in pn else wq
                     for x in nbrs]
                r = _mix(start, step, cur) % sum(w)
                cum = 0
                for x, wt in zip(nbrs, w):
                    cum += wt
                    if cum > r:
                        nxt = x
                        break
            out.append((start, step, nxt))
            prev, cur = cur, nxt
    return sorted(out)


def test_node2vec_matches_python(spark, two_components):
    from adopt_spark.algos.walks import node2vec_walks

    edges, pairs = two_components
    got = sorted((r.walk_id, r.step, r.v)
                 for r in node2vec_walks(spark, edges, 5, 1, 3, 2).collect())
    assert got == _py_node2vec(pairs, 5, 1, 3, 2)


def test_node2vec_equal_weights_is_uniform(spark, tri6):
    from adopt_spark.algos.walks import node2vec_walks, random_walks

    edges, _ = tri6
    eq = sorted(tuple(r)
                for r in node2vec_walks(spark, edges, 6, 1, 1, 1).collect())
    un = sorted(tuple(r) for r in random_walks(spark, edges, 6).collect())
    assert eq == un


def test_node2vec_return_bias_increases_backtracks(spark, two_components):
    """A huge return weight must produce at least as many immediate
    backtracks (v[t+1] == v[t-1]) as a tiny one. The fixture stores
    each undirected edge once as (lo, hi), which makes the directed
    walk monotone (no return edges exist) — symmetrize first."""
    from pyspark.sql import functions as F

    from adopt_spark.algos.walks import node2vec_walks

    one_way, _ = two_components
    edges = one_way.unionAll(
        one_way.select(F.col("tid").alias("sid"),
                       F.col("sid").alias("tid")))

    def backtracks(wp):
        seqs = defaultdict(dict)
        for r in node2vec_walks(spark, edges, 6, wp, 1, 1).collect():
            seqs[r.walk_id][r.step] = r.v
        n = 0
        for sv in seqs.values():
            seq = [sv[s] for s in sorted(sv)]
            n += sum(1 for i in range(2, len(seq))
                     if seq[i] == seq[i - 2])
        return n

    assert backtracks(50) >= backtracks(1)
    assert backtracks(50) > 0


def test_node2vec_validation(spark, tri6):
    import pytest

    from adopt_spark.algos.walks import node2vec_walks

    edges, _ = tri6
    with pytest.raises(ValueError):
        node2vec_walks(spark, edges, 4, 0, 1, 1)
