"""Differential + property tests for the spatial grid family
(round-3 session-12): distance join, hotspots, exact grid KNN."""

from __future__ import annotations

import math

import pytest

from adopt_spark.functions.spatial import (
    grid_distance_join, hotspot_cells, spatial_knn_exact,
)


def _points(n=300, seed=11, span=5000):
    rows, x = [], seed
    for i in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        ix = x % span
        x = (x * 1103515245 + 12345) % (1 << 31)
        iy = x % span
        rows.append((i, ix, iy))
    return rows


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "id long, ix long, iy long")


def test_distance_join_matches_bruteforce(spark):
    rows = _points()
    for radius in (150, 400):
        want = sorted(
            (a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
            for (a, xa, ya) in rows for (b, xb, yb) in rows
            if a < b and (xa - xb) ** 2 + (ya - yb) ** 2 <= radius ** 2)
        got = sorted(map(tuple, grid_distance_join(
            _pdf(spark, rows), radius).collect()))
        assert got == want
        assert len(want) > 0  # the fixture actually exercises pairs


def test_distance_join_cell_boundary_pairs(spark):
    # pair straddling a cell boundary exactly at distance == radius
    rows = [(0, 99, 0), (1, 199, 0), (2, 5000, 5000)]
    got = sorted(map(tuple, grid_distance_join(
        _pdf(spark, rows), 100).collect()))
    assert got == [(0, 1, 10000)]


def test_distance_join_rejects_bad_radius(spark):
    with pytest.raises(ValueError):
        grid_distance_join(_pdf(spark, []), 0)


def test_hotspots_match_bruteforce(spark):
    rows = _points(n=400)
    cell = 600
    counts: dict[tuple, int] = {}
    for _, ix, iy in rows:
        c = (ix // cell, iy // cell)
        counts[c] = counts.get(c, 0) + 1
    mean9 = 9 * sum(counts.values()) / len(counts)
    got = {(r.cx, r.cy): r for r in
           hotspot_cells(_pdf(spark, rows), cell).collect()}
    assert set(got) == set(counts)
    for (cx, cy), n in counts.items():
        nb = sum(counts.get((cx + dx, cy + dy), 0)
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        assert got[(cx, cy)].n == n
        assert got[(cx, cy)].nbhd_n == nb
        assert got[(cx, cy)].lift == pytest.approx(
            round(nb / mean9, 6), abs=1e-9)


def _brute_knn(rows, qids, k):
    out = []
    by_id = {i: (x, y) for i, x, y in rows}
    for q in qids:
        qx, qy = by_id[q]
        ds = sorted(((x - qx) ** 2 + (y - qy) ** 2, i)
                    for i, x, y in rows if i != q)
        out.extend((q, i, r + 1, d) for r, (d, i) in enumerate(ds[:k]))
    return sorted(out)


@pytest.mark.parametrize("cell,k", [(200, 5), (1000, 3), (50, 7)])
def test_knn_exact_matches_bruteforce(spark, cell, k):
    rows = _points(n=250)
    qids = [i for i in range(250) if i % 17 == 0]
    pts = _pdf(spark, rows)
    qs = pts.where(pts.id.isin(qids))
    got = sorted(map(tuple, spatial_knn_exact(
        pts, qs, k, cell, max_coord=5000).collect()))
    assert got == _brute_knn(rows, qids, k)


def test_knn_isolated_query_full_scan_path(spark):
    # a query alone in its 5x5 block must still return exact answers
    rows = [(0, 0, 0), (1, 4900, 4900), (2, 4950, 4950), (3, 4800, 4990)]
    pts = _pdf(spark, rows)
    qs = pts.where(pts.id == 0)
    got = sorted(map(tuple, spatial_knn_exact(
        pts, qs, 2, cell=100, max_coord=5000).collect()))
    assert got == _brute_knn(rows, [0], 2)


def test_knn_duplicate_points_and_ties(spark):
    # coincident points (d2=0) and symmetric ties break on id
    rows = [(0, 10, 10), (1, 10, 10), (2, 20, 10), (3, 0, 10)]
    pts = _pdf(spark, rows)
    got = sorted(map(tuple, spatial_knn_exact(
        pts, pts.where(pts.id == 0), 3, cell=100,
        max_coord=100).collect()))
    assert got == [(0, 1, 1, 0), (0, 2, 2, 100), (0, 3, 3, 100)]
