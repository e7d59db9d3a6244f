"""Shared vectorized sorted-intersection kernels (the leapfrog seek).

Every cogroup kernel in this package does the same core operation: for
an Arrow batch of rows, each carrying two sorted int64 arrays, test
membership of every "candidate" element in the same row's "pool"
array. The trick is one np.searchsorted for the whole batch: lift each
row's values into a disjoint key range (value + row * M) so the
concatenated pool is globally sorted (the batched analogue of the
reference's galloping seek, LFTJoin.java:113-145).

Overflow safety: value + row * M silently wraps int64 when
max_id * batch_rows approaches 2^63 (real-world 64-bit hash /
snowflake ids do), and assumes non-negative ids. ``member_mask``
therefore checks the packing bound per batch and falls back to
rank-compressing ids within the batch (np.unique + searchsorted —
a monotone remap, so per-row sortedness is preserved and M becomes
the number of distinct values in the batch, always safe).
"""

from __future__ import annotations

import numpy as np

_I64_MAX = np.iinfo(np.int64).max


def concat_rows(arrays: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a list of per-row arrays -> (flat, lengths, row_ids)."""
    n = len(arrays)
    lengths = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=n)
    flat = (np.concatenate(arrays) if lengths.sum()
            else np.empty(0, np.int64)).astype(np.int64, copy=False)
    rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    return flat, lengths, rows


def member_mask(cand: np.ndarray, rows_c: np.ndarray,
                pool: np.ndarray, rows_p: np.ndarray,
                n_rows: int) -> np.ndarray:
    """Bool mask over ``cand``: is cand[i] present in row rows_c[i]'s pool?

    ``pool`` must be sorted within each row; rows_p/rows_c must be
    non-decreasing (concat_rows output). Works for any int64 id range,
    including negative ids (rank-compression fallback).
    """
    if len(cand) == 0 or len(pool) == 0:
        return np.zeros(len(cand), dtype=bool)
    lo = min(int(cand.min()), int(pool.min()))
    hi = max(int(cand.max()), int(pool.max()))
    n = max(int(n_rows), 1)
    if lo < 0 or hi >= _I64_MAX // n:
        # ids too large (or negative) for value + row*M packing:
        # rank-compress within the batch. Monotone, so per-row order
        # is preserved; M is bounded by the batch's distinct count.
        uniq = np.unique(np.concatenate([cand, pool]))
        cand = np.searchsorted(uniq, cand).astype(np.int64)
        pool = np.searchsorted(uniq, pool).astype(np.int64)
        hi = len(uniq) - 1
    m = np.int64(hi + 1)
    pool_keys = pool + rows_p * m
    cand_keys = cand + rows_c * m
    idx = np.searchsorted(pool_keys, cand_keys)
    idx[idx == len(pool_keys)] = 0
    return pool_keys[idx] == cand_keys


def batch_intersect_counts(a_arrays: list, b_arrays: list) -> np.ndarray:
    """Per-row |a ∩ b| for a batch of sorted-array pairs (int64 counts)."""
    na = [np.asarray(x, dtype=np.int64) for x in a_arrays]
    nb = [np.asarray(x, dtype=np.int64) for x in b_arrays]
    n = len(na)
    cand, _, rows_c = concat_rows(na)
    pool, _, rows_p = concat_rows(nb)
    found = member_mask(cand, rows_c, pool, rows_p, n)
    return np.bincount(rows_c[found], minlength=n)


def batch_intersect_arrays(a_arrays: list, b_arrays: list) -> list[list[int]]:
    """Per-row sorted intersection a ∩ b for a batch of array pairs."""
    na = [np.asarray(x, dtype=np.int64) for x in a_arrays]
    nb = [np.asarray(x, dtype=np.int64) for x in b_arrays]
    n = len(na)
    cand, _, rows_c = concat_rows(na)
    pool, _, rows_p = concat_rows(nb)
    found = member_mask(cand, rows_c, pool, rows_p, n)
    kept, kept_rows = cand[found], rows_c[found]
    splits = np.searchsorted(kept_rows, np.arange(1, n))
    return [x.tolist() for x in np.split(kept, splits)]
