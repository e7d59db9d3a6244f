"""Distributed 4-cycle counting — the leapfrog recast for cycles.

The reference's cycle queries are its hardest workload (report Table 2:
5-cycle 377.9s vs 5-clique 77.9s on ego-Twitter) because cycle motifs
have no dense core to prune on. Its encoding (graph_query/4_cycle.sql)
counts *increasing* cycles: v1 < v2 < v3 < v4 with lt-edges
(v1,v2), (v2,v3), (v3,v4), (v1,v4).

Encoding detail (graph_query/4_cycle.sql): the chain aliases e1..e3
carry the ``sid < tid`` filter, the closing alias e4 = (v4, v1) is a
RAW directed edge with no order filter. The count factorizes over the
(v1, v3) "diagonal":

    count = Σ_{(v1,v3)}  k_mid(v1,v3) · k_high(v1,v3)

    k_mid  = #{v2 : (v1,v2), (v2,v3) lt-edges}    (increasing wedges)
    k_high = |A+(v3) ∩ Rin(v1)|                   (v4 choices: (v3,v4)
              an lt-edge AND (v4,v1) a raw directed edge; every
              element of A+(v3) is > v3, so the range bound is free)

where A+(v) = {w > v : (v,w) an lt-edge} and Rin(v) = {u : (u,v) a
directed edge}, both sorted. Physical plan:

  1. wedge aggregation: lt ⋈ lt on the middle vertex, groupBy (v1,v3)
     with map-side partial counts — k_mid for every candidate pair;
  2. join the pair table to the sorted adjacency on v1 and v3 (inner —
     a v3 with empty A+ closes nothing), then one vectorized
     searchsorted intersection per Arrow batch gives k_high;
  3. one aggregate sums k_mid · k_high.

No broadcast, no driver collect — works at any scale; AQE splits
hub-skewed pair partitions. The SQL plan (motifs.cycle_sql) remains
the oracle and materializes length-3 paths, strictly more rows than
this kernel's wedge count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def cycle4_count_cogroup(edges: DataFrame) -> DataFrame:
    """Increasing-4-cycle count; returns 1-row DF [n_cycles: long]."""
    lt = (edges.where(F.col("sid") < F.col("tid"))
          .dropDuplicates(["sid", "tid"]))
    # k_mid per (v1, v3): increasing wedges through any middle vertex
    e1 = lt.select(F.col("sid").alias("v1"), F.col("tid").alias("mid"))
    e2 = lt.select(F.col("sid").alias("mid"), F.col("tid").alias("v3"))
    pairs = (e1.join(e2, "mid")
             .groupBy("v1", "v3")
             .agg(F.count(F.lit(1)).alias("k_mid")))
    raw = edges.dropDuplicates(["sid", "tid"])
    rin = raw.groupBy("tid").agg(F.sort_array(F.collect_list("sid")).alias("nbrs"))
    adj = lt.groupBy("sid").agg(F.sort_array(F.collect_list("tid")).alias("nbrs"))
    a1 = rin.select(F.col("tid").alias("v1"), F.col("nbrs").alias("nbrs_1"))
    a3 = adj.select(F.col("sid").alias("v3"), F.col("nbrs").alias("nbrs_3"))
    cand = pairs.join(a1, "v1").join(a3, "v3").select("k_mid", "nbrs_1", "nbrs_3")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            n = len(batch)
            if n == 0:
                continue
            na = [np.asarray(x, dtype=np.int64) for x in batch["nbrs_1"]]
            nb = [np.asarray(x, dtype=np.int64) for x in batch["nbrs_3"]]
            la = np.array([len(x) for x in na], dtype=np.int64)
            lb = np.array([len(x) for x in nb], dtype=np.int64)
            cand_v = np.concatenate(na) if la.sum() else np.empty(0, np.int64)
            pool = np.concatenate(nb) if lb.sum() else np.empty(0, np.int64)
            if len(cand_v) == 0 or len(pool) == 0:
                yield pd.DataFrame({"partial": [0]})
                continue
            m = np.int64(max(int(cand_v.max()), int(pool.max())) + 1)
            rows_a = np.repeat(np.arange(n, dtype=np.int64), la)
            pool_keys = pool + np.repeat(np.arange(n, dtype=np.int64), lb) * m
            cand_keys = cand_v + rows_a * m
            idx = np.searchsorted(pool_keys, cand_keys)
            idx[idx == len(pool_keys)] = 0
            found = pool_keys[idx] == cand_keys
            k_high = np.bincount(rows_a[found], minlength=n)
            k_mid = batch["k_mid"].to_numpy(np.int64)
            yield pd.DataFrame({"partial": [int((k_mid * k_high).sum())]})

    partials = cand.mapInPandas(kernel, schema="partial long")
    return partials.agg(F.coalesce(F.sum("partial"), F.lit(0))
                        .cast("long").alias("n_cycles"))
