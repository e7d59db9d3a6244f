"""Distributed skyline (Pareto frontier) query.

The skyline of a table under a set of minimize/maximize criteria is
the rows not DOMINATED by any other row (dominated = another row is
at-least-as-good on every criterion and strictly better on one) —
the classic multi-criteria selection operator (Börzsönyi et al.,
ICDE'01 "The Skyline Operator"), useful in a training-data pipeline
for picking non-dominated documents under (quality score, length,
dedup distance, toxicity) style trade-offs.

Distribution strategy (two-phase, the standard MR-skyline shape):
every partition computes its LOCAL skyline with a vectorized kernel
— correct because the global skyline is a subset of the union of
local skylines (a global survivor can't be dominated inside its own
partition) — then the union of survivors (small: skylines grow
~O(log^{d-1} n) for independent dims) collapses to one partition for
the final pass of the SAME kernel. No all-pairs join, no driver loop.

Kernel: points sorted lexicographically on the (sign-normalized)
criteria; a dominator always sorts strictly before what it dominates,
so one forward scan against the running skyline set suffices. The
scan is per-candidate Python over numpy broadcast compares — O(n·|S|)
with |S| = current skyline size, fine for the 10^5-rows-per-partition
regime this targets (note: the per-point loop is bounded by the
LOCAL skyline size, which stays small on real distributions).

Reference parity: jxiw/ADOPT has no skyline operator; this extends
the relational surface the same way rollup/cube do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame, cols: list[str],
                   signs: np.ndarray) -> pd.DataFrame:
    if len(pdf) == 0:
        return pdf
    m = pdf[cols].to_numpy(dtype=np.float64) * signs  # all-minimize
    order = np.lexsort(m.T[::-1])                     # lexicographic
    m = m[order]
    keep_idx: list[int] = []
    sky = np.empty((0, m.shape[1]))
    for i in range(len(m)):
        p = m[i]
        if len(sky) and bool(
                ((sky <= p).all(axis=1) & (sky < p).any(axis=1)).any()):
            continue
        keep_idx.append(i)
        sky = np.vstack([sky, p])
    return pdf.iloc[order[keep_idx]]


def skyline(df: DataFrame, minimize: list[str] | tuple[str, ...] = (),
            maximize: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Pareto-optimal rows of ``df`` under the given criteria.

    Returns the input rows (all columns preserved) that no other row
    dominates. Duplicate criterion vectors all survive (neither
    strictly dominates the other) — deterministic at any parallelism.
    """
    cols = list(minimize) + list(maximize)
    if not cols:
        raise ValueError("skyline needs at least one criterion column")
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"criterion columns not in frame: {sorted(missing)}")
    signs = np.array([1.0] * len(minimize) + [-1.0] * len(maximize))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # concat the partition's Arrow batches first: the skyline must
        # be computed over the WHOLE partition (per-batch skylines
        # would leak dominated rows from the final single partition)
        batches = [pdf for pdf in it if len(pdf)]
        if batches:
            yield _local_skyline(pd.concat(batches, ignore_index=True),
                                 cols, signs)

    local = df.mapInPandas(kernel, df.schema)
    # survivors are few: one partition, same kernel, global answer
    return local.coalesce(1).mapInPandas(kernel, df.schema)
