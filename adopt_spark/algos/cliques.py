"""Generalized k-clique counting — the leapfrog triejoin, level at a time.

The reference's n-clique queries (graph_query/{4,5,6,7}_clique.sql)
bind one join variable at a time with an intersection of trie
iterators, always advancing the cheapest iterator
(HyperCubeEvaluationTask.java leapfrog loop; LFTJoin galloping seek).
This module is that algorithm over a broadcast CSR, vectorized:

  level 2   : the oriented edge list, range-sliced across workers
              (slices ≫ cores — the hypercube work-queue analogue);
  level t→t+1: for every partial clique (v1..vt), enumerate candidate
              extensions w from the out-list of the partial's
              MINIMUM-out-degree member (the "cheapest iterator"
              rule), then membership-test (vi, w) against the sorted
              edge-key array for every other member — each test one
              vectorized np.searchsorted (the galloping seek,
              batched);
  level k   : survivors are counted, not materialized.

Degree orientation makes every clique appear exactly once (a total
order orients each clique as a single increasing chain) and bounds
every out-list at O(sqrt E). Counts equal the reference's id-ordered
clique counts on the lt-filtered pair set by construction.

Same broadcast-regime contract as triangles.triangle_count_csr: the
oriented edge list must fit on one worker (≤ CSR_BROADCAST_MAX_EDGES);
beyond that, motifs.clique_sql gives the arbitrary-scale shuffle plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# Same bound (and rationale) as triangles.CSR_BROADCAST_MAX_EDGES:
# ~400 MB driver-side at 25M oriented edges, which is also about where
# the cogroup plan starts winning anyway.
CSR_BROADCAST_MAX_EDGES = 25_000_000


@dataclass
class OrientedCSR:
    """Degree-oriented edge set in CSR + sorted-key form (numpy)."""

    m: np.int64                 # id modulus for (u,v) -> u*m+v packing
    src: np.ndarray             # oriented edges sorted by (src, dst)
    dst: np.ndarray
    keys: np.ndarray            # src*m + dst, sorted
    usrc: np.ndarray            # unique srcs
    indptr: np.ndarray          # CSR offsets into dst, aligned to usrc
    outdeg_of: np.ndarray       # dense: vertex id -> oriented out-degree


def build_oriented_csr(edges: DataFrame,
                       _oriented: DataFrame | None = None) -> OrientedCSR | None:
    """lt-filter → dedup → degree-orient → CSR, all linear-time numpy.

    Returns None when the input exceeds the broadcast regime (caller
    falls back to the shuffle plan) or is empty. ``_oriented``: a
    pre-built degree-oriented deduped [src, dst] set (e.g. from an
    auto dispatcher's cached orientation or the materialized layout)
    — skips the re-orient.
    """
    if _oriented is not None:
        src_df = _oriented.select("src", "dst")
    else:
        src_df = (edges.where(F.col("sid") < F.col("tid"))
                  .select(F.col("sid").alias("src"), F.col("tid").alias("dst")))
    # Bound probe BEFORE collecting — the driver-memory guard is useless
    # if the full edge set is pulled to the driver first. limit+count
    # stops scanning once the bound is exceeded.
    if src_df.limit(CSR_BROADCAST_MAX_EDGES + 1).count() > CSR_BROADCAST_MAX_EDGES:
        return None
    raw = src_df.toPandas()
    if len(raw) == 0:
        return None
    a = raw["src"].to_numpy(np.int64)
    b = raw["dst"].to_numpy(np.int64)
    max_id = int(max(a.max(), b.max()))
    # dense degree array + key packing guards (packing also needs >= 0)
    if max_id >= 50_000_000 or int(min(a.min(), b.min())) < 0:
        return None
    m = np.int64(max_id + 1)
    if _oriented is not None:
        src, dst = a, b              # already oriented + deduped
    else:
        pair = np.unique(a * m + b)
        a, b = pair // m, pair % m
        deg = (np.bincount(a, minlength=max_id + 1)
               + np.bincount(b, minlength=max_id + 1))
        fwd = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
        src = np.where(fwd, a, b)
        dst = np.where(fwd, b, a)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keys = src * m + dst
    usrc, first = np.unique(src, return_index=True)
    indptr = np.append(first, len(src))
    outdeg_of = np.zeros(max_id + 1, dtype=np.int64)
    outdeg_of[usrc] = indptr[1:] - indptr[:-1]
    return OrientedCSR(m=m, src=src, dst=dst, keys=keys, usrc=usrc,
                       indptr=indptr, outdeg_of=outdeg_of)


def _expand(csr: OrientedCSR, cols: list[np.ndarray],
            count_only: bool) -> tuple[list[np.ndarray], int]:
    """One leapfrog level: extend partials by one vertex.

    cols: t arrays of equal length (the partial cliques). Returns
    (t+1 extended column arrays, count) — count only filled when
    count_only (final level, survivors not materialized).
    """
    n = len(cols[0])
    if n == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(len(cols) + 1)], 0
    degs = np.stack([csr.outdeg_of[c] for c in cols])   # t x n
    enum_idx = degs.argmin(axis=0)                      # cheapest iterator
    enum_v = np.take_along_axis(np.stack(cols), enum_idx[None, :], 0)[0]
    pos = np.searchsorted(csr.usrc, enum_v)
    # vertices with zero out-degree don't appear in usrc; clamp + mask
    pos = np.minimum(pos, len(csr.usrc) - 1)
    has = csr.usrc[pos] == enum_v
    starts = np.where(has, csr.indptr[pos], 0)
    ends = np.where(has, csr.indptr[pos + 1], 0)
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(len(cols) + 1)], 0
    base = np.repeat(starts, counts)
    step = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    w = csr.dst[base + step]
    ridx = np.repeat(np.arange(n, dtype=np.int64), counts)
    mask = np.ones(total, dtype=bool)
    enum_rep = np.repeat(enum_idx, counts)
    for j, c in enumerate(cols):
        tst = enum_rep != j                             # skip the enumerated side
        if not tst.any():
            continue
        cand = c[ridx] * csr.m + w
        idx = np.searchsorted(csr.keys, cand)
        idx[idx == len(csr.keys)] = 0
        ok = csr.keys[idx] == cand
        mask &= np.where(tst, ok, True)
    if count_only:
        return [], int(mask.sum())
    keep = mask
    return [c[ridx][keep] for c in cols] + [w[keep]], 0


def _intersect_kernel(a_col: str, b_col: str, out_col: str):
    """mapInPandas kernel: per row, intersection of two sorted arrays.

    Vectorized over the whole Arrow batch: concatenate the pool-side
    arrays, lift each row's values into a disjoint key range
    (value + row * M) so the concatenation is globally sorted, and one
    np.searchsorted of all candidate keys is the leapfrog seek for the
    entire batch (LFTJoin.java:113-145, batched).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from adopt_spark.algos._kernels import batch_intersect_arrays

        for batch in it:
            if len(batch) == 0:
                continue
            yield pd.DataFrame({out_col: batch_intersect_arrays(
                list(batch[a_col]), list(batch[b_col]))})

    return kernel


def clique_count_cogroup(edges: DataFrame, k: int,
                         _oriented: DataFrame | None = None) -> DataFrame:
    """Distributed k-clique leapfrog; returns [n_cliques: long].

    Works at any edge count — nothing broadcast, nothing collected.
    The leapfrog state per partial clique collapses to its **candidate
    set**: the sorted intersection of the oriented out-lists of every
    member. Each level is then

        explode(candidates) → join sorted-adjacency on the new vertex
        → vectorized intersect (one searchsorted per Arrow batch)

    and the k-clique count is Σ |candidates| over level-(k-1) partials.
    Degree orientation makes every clique a single strictly-increasing
    chain in the (deg, id) total order, so each is counted exactly once
    and every out-list (hence every candidate array) is O(sqrt E).
    This is the cogroup generalization of the broadcast kernel above —
    same per-level semantics as the reference's LFTJ variable bindings
    (HyperCubeEvaluationTask.java:283-369), with Spark shuffles as the
    level boundaries and AQE handling skewed hub partitions.
    """
    if k < 3:
        raise ValueError("clique size must be >= 3")
    from adopt_spark.edges import orient_by_degree

    # persist self-built orientation and the adjacency: o feeds the
    # adjacency build AND the level-2 edge stream, adj feeds THREE
    # aliases (au, av, aw) — without caching, orientation would be
    # recomputed per consumer (same fix as triangle_count_cogroup)
    own_o = _oriented is None
    o = _oriented if _oriented is not None else orient_by_degree(
        edges.where(F.col("sid") < F.col("tid"))
        .dropDuplicates(["sid", "tid"])).persist()
    adj = (o.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
           .persist())
    au = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nbrs_u"))
    av = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nbrs_v"))
    # level 2: every oriented edge (u,v) with cand = N+(u) ∩ N+(v)
    p = (
        o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(au, "u").join(av, "v")
        .select("nbrs_u", "nbrs_v")
        .mapInPandas(_intersect_kernel("nbrs_u", "nbrs_v", "cand"),
                     schema="cand array<bigint>")
    )
    # levels 3..k-1: bind one more vertex w from cand, re-intersect
    aw = adj.select(F.col("src").alias("w"), F.col("nbrs").alias("nbrs_w"))
    for _ in range(k - 3):
        p = (
            p.select(F.explode("cand").alias("w"), "cand")
            .join(aw, "w")                      # w without out-list extends nothing
            .select("cand", "nbrs_w")
            .mapInPandas(_intersect_kernel("cand", "nbrs_w", "cand"),
                         schema="cand array<bigint>")
        )
    n = int(p.agg(F.coalesce(F.sum(F.size("cand")), F.lit(0))
                  .cast("long").alias("n_cliques")).collect()[0][0])
    adj.unpersist()
    if own_o:
        o.unpersist()
    return o.sparkSession.createDataFrame([(n,)], "n_cliques long")


def clique_count(edges: DataFrame, k: int, method: str = "auto") -> DataFrame:
    """k-clique count with adaptive physical-strategy selection.

    ``auto`` mirrors triangles.triangle_count_auto: one aggregate over
    the oriented out-degree distribution gives the exact wedge count W;
    W/E below the threshold → the generated multi-join SQL plan (its
    shuffles are proportional to the enumerated partials, tiny on
    sparse graphs); above → the leapfrog kernels (broadcast CSR while
    the edge list fits a worker, distributed cogroup beyond).
    """
    if method == "csr":
        return clique_count_csr(edges, k)
    if method == "cogroup":
        return clique_count_cogroup(edges, k)
    if method == "sql":
        from adopt_spark.algos.motifs import clique_sql, run_motif
        # set semantics, matching the kernels (see cycles.cycle_count)
        dedup = edges.dropDuplicates(["sid", "tid"])
        out = run_motif(edges.sparkSession, dedup, clique_sql(k))
        return out.select(F.col("n").alias("n_cliques"))
    if method != "auto":
        raise ValueError(f"unknown method: {method}")

    from adopt_spark.algos.triangles import AUTO_WEDGE_EDGE_RATIO
    from adopt_spark.edges import orient_by_degree

    o = orient_by_degree(
        edges.where(F.col("sid") < F.col("tid"))
        .dropDuplicates(["sid", "tid"])).persist()
    try:
        row = (
            o.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum("d").alias("e"),
                 F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()[0]
        )
        n_edges = int(row["e"] or 0)
        if n_edges == 0:
            return edges.sparkSession.createDataFrame([(0,)], "n_cliques long")
        if float(row["w"] or 0.0) / n_edges < AUTO_WEDGE_EDGE_RATIO:
            chosen = clique_count(edges, k, "sql")
        elif n_edges <= CSR_BROADCAST_MAX_EDGES:
            chosen = clique_count_csr(edges, k, _oriented=o)
        else:
            chosen = clique_count_cogroup(edges, k, _oriented=o)
        # materialize before the cached orientation is dropped
        n = int(chosen.collect()[0][0])
        return edges.sparkSession.createDataFrame([(n,)], "n_cliques long")
    finally:
        o.unpersist()


def clique_count_csr(edges: DataFrame, k: int,
                     _oriented: DataFrame | None = None) -> DataFrame:
    """k-clique count via the broadcast-CSR leapfrog; [n_cliques: long].

    Falls back to the distributed cogroup leapfrog outside the
    broadcast regime (mirrors triangles.triangle_count_csr) — the
    regimes where the CSR bails (too many oriented edges, huge vertex
    ids) are exactly where the SQL multi-join plan would materialize
    the path blowup the kernels exist to avoid. ``method="sql"`` on
    clique_count is the only route to the SQL plan.
    """
    if k < 3:
        raise ValueError("clique size must be >= 3")
    spark = edges.sparkSession
    csr = build_oriented_csr(edges, _oriented=_oriented)
    if csr is None:
        return clique_count_cogroup(edges, k, _oriented=_oriented)

    sc = spark.sparkContext
    b = sc.broadcast(csr)
    n_edges = len(csr.src)
    n_slices = max(sc.defaultParallelism * 4, 8)
    bounds = np.linspace(0, n_edges, n_slices + 1).astype(np.int64)
    slices = spark.createDataFrame(
        [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_slices)],
        "lo long, hi long",
    ).repartition(n_slices)

    levels = k

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        csr_l = b.value
        for batch in it:
            out = []
            for lo, hi in zip(batch["lo"], batch["hi"]):
                cols = [csr_l.src[lo:hi].copy(), csr_l.dst[lo:hi].copy()]
                count = 0
                for level in range(3, levels + 1):
                    cols, count = _expand(csr_l, cols, count_only=(level == levels))
                out.append(count if levels > 2 else hi - lo)
            yield pd.DataFrame({"partial": out})

    partials = slices.mapInPandas(kernel, schema="partial long")
    return partials.agg(F.coalesce(F.sum("partial"), F.lit(0))
                        .cast("long").alias("n_cliques"))
