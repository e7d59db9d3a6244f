"""Skew helpers: salted aggregation equals plain aggregation."""

import pytest
from pyspark.sql import functions as F

from adopt_spark.skew import hub_vertices, salted_group_sum


def test_salted_group_sum_matches_plain(spark):
    df = spark.range(100_000).select(
        (F.col("id") % 7).alias("k"),         # 7 hot keys
        (F.col("id") * 0.5).alias("x"))
    plain = {r["k"]: r["s"] for r in
             df.groupBy("k").agg(F.sum("x").alias("s")).collect()}
    salted = {r["k"]: r["total"] for r in
              salted_group_sum(df, "k", "x", "total", salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_hub_vertices(spark):
    deg = spark.createDataFrame([(1, 500), (2, 3), (3, 10_000)], "v long, deg long")
    hubs = {r["v"] for r in hub_vertices(deg, threshold=100).collect()}
    assert hubs == {1, 3}


def test_partition_quality_hand_case(spark):
    from adopt_spark.skew import _LCG_A, _LCG_C, _LCG_M, partition_quality

    pairs = [(i, (i + 1) % 40) for i in range(40)]  # ring: ids local
    pairs += [(i, i + 20) for i in range(10)]       # some long chords
    df = spark.createDataFrame(pairs, "sid long, tid long")
    k = 4
    rows = {r.strategy: r for r in partition_quality(df, k).collect()}
    assert set(rows) == {"hash", "range", "edge_hash_vertex_cut"}

    def lcg(v):
        return ((v * _LCG_A + _LCG_C) % _LCG_M) % k

    lo = min(min(s, t) for s, t in pairs)
    hi = max(max(s, t) for s, t in pairs)

    def rng(v):
        return min(k - 1, (v - lo) * k // (hi - lo + 1))

    for name, part in (("hash", lcg), ("range", rng)):
        cut = sum(1 for s, t in pairs if part(s) != part(t))
        per = {}
        for s, t in pairs:
            per[part(s)] = per.get(part(s), 0) + 1
            per[part(t)] = per.get(part(t), 0) + 1
        bal = max(per.values()) / (sum(per.values()) / len(per))
        r = rows[name]
        assert r.n_edges == len(pairs)
        assert r.edges_cut == cut
        assert r.cut_frac == pytest.approx(round(cut / len(pairs), 6))
        assert r.balance == pytest.approx(round(bal, 6), abs=1e-9)
        assert r.repl_factor is None

    def epart(s, t):
        return ((s * _LCG_A + t * _LCG_C + 99991) % _LCG_M) % k

    touch: dict[int, set] = {}
    for s, t in pairs:
        p = epart(s, t)
        touch.setdefault(s, set()).add(p)
        touch.setdefault(t, set()).add(p)
    repl = sum(len(v) for v in touch.values()) / len(touch)
    r = rows["edge_hash_vertex_cut"]
    assert r.edges_cut is None and r.cut_frac is None
    assert r.repl_factor == pytest.approx(round(repl, 6), abs=1e-9)
    # range beats hash on an id-local ring — the metric's raison d'etre
    assert rows["range"].edges_cut < rows["hash"].edges_cut


def test_partition_quality_validation(spark):
    from adopt_spark.skew import partition_quality

    df = spark.createDataFrame([(0, 1)], "sid long, tid long")
    with pytest.raises(ValueError):
        partition_quality(df, 1)


def test_chung_lu_gen_heavy_tail_and_python_parity(spark):
    """The generator law replayed in python; the weight law must
    produce a heavy tail (hub degrees >> median)."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    with mock.patch.object(R, "_t", lambda s_, sf, name: None):
        hist = {r.deg: r.n_vertices
                for r in R.q_chung_lu_gen(spark, "x").collect()}

    n, A, B, M = R._CL_N, R._CL_A, R._CL_B, R._CL_M
    s = sum(1 + n // (k + 1) for k in range(n))
    deg = {}
    for i in range(n):
        wi = 1 + n // (i + 1)
        for j in range(i + 1, n):
            wj = 1 + n // (j + 1)
            if (i * A + j * B) % M % s < wi * wj:
                deg[i] = deg.get(i, 0) + 1
                deg[j] = deg.get(j, 0) + 1
    want = {}
    for d in deg.values():
        want[d] = want.get(d, 0) + 1
    assert hist == want
    assert max(deg.values()) > 10 * sorted(deg.values())[len(deg) // 2]
