"""Overflow-safety of the shared batched intersection kernel.

The value + row*M key packing wraps int64 once max_id * batch_rows
crosses 2^63 (snowflake-scale ids), and breaks outright on negative
ids. member_mask must detect both and rank-compress within the batch.
"""

import numpy as np

from adopt_spark.algos._kernels import (
    batch_intersect_arrays, batch_intersect_counts, concat_rows, member_mask,
)
from adopt_spark.algos.cycles import cycle_count_cogroup
from adopt_spark.algos.triangles import triangle_count_cogroup

HUGE = 2**61  # HUGE * a-few-rows overflows the packed-key bound


def test_member_mask_small_ids():
    a = [np.array([1, 3, 5]), np.array([2, 4])]
    b = [np.array([3, 5, 9]), np.array([4])]
    counts = batch_intersect_counts(a, b)
    assert counts.tolist() == [2, 1]
    inter = batch_intersect_arrays(a, b)
    assert inter == [[3, 5], [4]]


def test_member_mask_huge_ids_rank_compress():
    a = [np.array([HUGE + 1, HUGE + 3]), np.array([HUGE + 2])] * 8
    b = [np.array([HUGE + 3]), np.array([HUGE + 2, HUGE + 9])] * 8
    counts = batch_intersect_counts(a, b)
    assert counts.tolist() == [1, 1] * 8


def test_member_mask_negative_ids():
    a = [np.array([-5, -1, 2])]
    b = [np.array([-5, 2, 7])]
    assert batch_intersect_counts(a, b).tolist() == [2]
    assert batch_intersect_arrays(a, b) == [[-5, 2]]


def test_member_mask_forced_overflow_equals_packed():
    rng = np.random.default_rng(7)
    rows = 50
    a = [np.unique(rng.integers(0, 40, 6)) for _ in range(rows)]
    b = [np.unique(rng.integers(0, 40, 6)) for _ in range(rows)]
    expect = [len(np.intersect1d(x, y)) for x, y in zip(a, b)]
    assert batch_intersect_counts(a, b).tolist() == expect
    # same batch lifted into the unsafe id range: rank-compression path
    a2 = [x + HUGE for x in a]
    b2 = [y + HUGE for y in b]
    assert batch_intersect_counts(a2, b2).tolist() == expect


def test_triangle_cogroup_huge_ids(spark):
    # triangle + a pendant edge, ids in the snowflake range
    v = [HUGE + 10, HUGE + 20, HUGE + 30, HUGE + 40]
    pairs = [(v[0], v[1]), (v[1], v[2]), (v[0], v[2]), (v[2], v[3])]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    assert triangle_count_cogroup(df).collect()[0][0] == 1


def test_cycle_cogroup_huge_ids(spark):
    v = [HUGE + i for i in (1, 2, 3, 4)]
    pairs = [(v[0], v[1]), (v[1], v[2]), (v[2], v[3]), (v[3], v[0])]
    df = spark.createDataFrame(pairs, "sid long, tid long")
    assert cycle_count_cogroup(df, 4).collect()[0][0] == 1


def test_concat_rows_empty():
    flat, lengths, rows = concat_rows([])
    assert len(flat) == 0 and len(lengths) == 0 and len(rows) == 0
    assert member_mask(flat, rows, flat, rows, 0).tolist() == []


def test_csr_fallback_set_semantics_huge_ids(spark):
    """Out-of-regime CSR fallback (huge ids) must count the edge SET:
    duplicated rows don't multiply the count in any strategy."""
    from adopt_spark.algos.cliques import clique_count

    v = [HUGE + 10, HUGE + 20, HUGE + 30]
    tri = [(v[0], v[1]), (v[1], v[2]), (v[0], v[2])]
    df = spark.createDataFrame(tri + tri, "sid long, tid long")  # dup rows
    assert clique_count(df, 3, "csr").collect()[0][0] == 1
    assert clique_count(df, 3, "cogroup").collect()[0][0] == 1
    assert clique_count(df, 3, "sql").collect()[0][0] == 1


def test_triangle_cogroup_kernel_dispatch_same_count(spark, powerlaw_small,
                                                     monkeypatch):
    """The sparse-regime JVM array_intersect path and the dense-regime
    numpy batch kernel must agree; the threshold only picks the plan."""
    import adopt_spark.algos.triangles as tri

    df, pairs = powerlaw_small
    monkeypatch.setattr(tri, "_JVM_INTERSECT_MAX_MEAN_LEN", 1e18)
    n_jvm = tri.triangle_count_cogroup(df).collect()[0][0]
    monkeypatch.setattr(tri, "_JVM_INTERSECT_MAX_MEAN_LEN", -1.0)
    n_py = tri.triangle_count_cogroup(df).collect()[0][0]
    assert n_jvm == n_py
    from tests.conftest import py_triangles
    assert n_jvm == py_triangles(pairs)
