"""Distributed n-cycle counting — the leapfrog recast for cycles.

The reference's cycle queries are its hardest workload (report Table 2:
5-cycle 377.9s vs 5-clique 77.9s on ego-Twitter) because cycle motifs
have no dense core to prune on. Its encodings
(graph_query/{4..7}_cycle.sql) count *increasing* cycles
v1 < v2 < ... < vn: the chain aliases e1..e(n-1) carry the
``sid < tid`` filter, and the closing alias is a RAW directed edge
(v4, v1) for n=4 / (v1, v5) for n=5, or an lt edge (v1, vn) for
n in {6, 7} (see motifs.cycle_sql, verified verbatim vs the files).

The naive multi-join plan materializes every length-(n-1) increasing
path — exactly the blowup WCOJ exists to avoid. This kernel instead
runs a **path-count dynamic program over endpoint pairs** (sparse
boolean matrix powers, Spark-shuffle edition) and closes cycles with
one vectorized sorted-intersection pass:

    p2(v1, x)   = #{v2 : (v1,v2), (v2,x) lt-edges}      (wedge agg)
    pk(v1, x)   = Σ_y p(k-1)(v1, y) · [(y,x) ∈ lt]      (k = 3..n-2)
    count       = Σ_{(v1,x)} p(n-2)(v1, x) · |A+(x) ∩ C(v1)|

where A+(v) = {w > v : (v,w) lt-edge} sorted, and the closing
constraint set C matches the reference encoding:

    n = 4 : C(v1) = Rin(v1)  = {u : (u,v1) raw edge}
    n = 5 : C(v1) = Rout(v1) = {w : (v1,w) raw edge}
    n >= 6: C(v1) = A+(v1)                   (lt closing edge)

Why this is the 100-TB plan: every stage is a pair-aggregated
equi-join — shuffle volume per level is the *aggregated pair count*
(≤ min(paths, V²) rows), never the path count; partial aggregation
runs map-side; AQE splits hub-skewed pair partitions; nothing is
broadcast or collected. v1 values that cannot close (empty C) are
semi-join-pruned before the DP fans out. The strictly-increasing
chain makes every path vertex-distinct for free, so the DP is exact.

Correctness: each vertex along the chain is strictly greater than its
predecessor, so no path revisits a vertex and every increasing cycle
is generated exactly once — the DP equals the reference SQL count
(differentially tested against motifs.cycle_sql for n = 4..7).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# W/E dispatch threshold for cycle_count(..., "auto"), shared rationale
# with triangles.AUTO_WEDGE_EDGE_RATIO: the DP pays one aggregated
# shuffle per level to avoid materializing paths, so it wins when the
# wedge count dwarfs the edge count (dense graphs); the generated SQL
# plan wins when the graph is so sparse that paths ≈ edges.
AUTO_WEDGE_EDGE_RATIO = 8.0


def _closing_sets(edges: DataFrame, lt: DataFrame, n: int) -> DataFrame:
    """Sorted closing-constraint adjacency C(v1) per the encoding."""
    raw = edges.dropDuplicates(["sid", "tid"])
    if n == 4:     # raw closing edge (v4, v1): in-neighbors of v1
        side = raw.select(F.col("tid").alias("v1"), F.col("sid").alias("c"))
    elif n == 5:   # raw closing edge (v1, v5): out-neighbors of v1
        side = raw.select(F.col("sid").alias("v1"), F.col("tid").alias("c"))
    else:          # lt closing edge (v1, vn)
        side = lt.select(F.col("sid").alias("v1"), F.col("tid").alias("c"))
    return side.groupBy("v1").agg(F.sort_array(F.collect_list("c")).alias("nbrs_c"))


def cycle_count_cogroup(edges: DataFrame, n: int,
                        _lt: DataFrame | None = None) -> DataFrame:
    """Increasing-n-cycle count (reference encoding), n in 4..;
    returns a 1-row DataFrame [n_cycles: long].

    Executes eagerly: the lt edge set feeds 4+ legs of the DP (both
    wedge sides, every chain step, the closing adjacency) and the
    closing adjacency feeds both the v1 semi-join prune and the final
    join — both are persisted for the run and unpersisted before
    returning, so one scan+distinct serves every leg instead of
    Catalyst re-deriving it per leg.
    """
    if n < 4:
        raise ValueError("cycle kernel requires n >= 4 (3-cycle = triangle)")
    spark = edges.sparkSession
    own_lt = _lt is None
    lt = (_lt if _lt is not None
          else (edges.where(F.col("sid") < F.col("tid"))
                .dropDuplicates(["sid", "tid"])).persist())
    closing = _closing_sets(edges, lt, n).persist()
    try:
        # id-width narrowing (same probe-and-narrow as the triangle
        # cogroup kernel): every id the DP shuffles comes from lt or
        # the closing table, both persisted — two cheap bound probes,
        # and when everything fits int32 the per-level pair rows and
        # the intersection arrays ship at half the key bytes. The
        # Arrow kernel is dtype-agnostic (coerces to int64 in-memory).
        b1 = lt.agg(F.min("sid").alias("a"), F.max("tid").alias("b"),
                    F.min("tid").alias("c"), F.max("sid").alias("d")
                    ).collect()[0]
        b2 = closing.agg(
            F.min("v1").alias("a"), F.max("v1").alias("b"),
            F.min(F.array_min("nbrs_c")).alias("c"),
            F.max(F.array_max("nbrs_c")).alias("d")).collect()[0]
        bounds = [b1["a"], b1["b"], b1["c"], b1["d"],
                  b2["a"], b2["b"], b2["c"], b2["d"]]
        fits32 = (all(v is not None for v in bounds)
                  and min(bounds) >= -(2 ** 31)
                  and max(bounds) <= 2 ** 31 - 1)
        idt = "int" if fits32 else "long"
        lt_t = lt.select(F.col("sid").cast(idt).alias("sid"),
                         F.col("tid").cast(idt).alias("tid"))
        closing_t = closing.select(
            F.col("v1").cast(idt).alias("v1"),
            F.col("nbrs_c").cast(f"array<{idt}>").alias("nbrs_c"))

        # the final pair table's x must have a non-empty lt out-list to
        # close — prune those x BEFORE the last aggregation shuffles
        # their pairs (they would join-eliminate at close anyway, but
        # only after paying the shuffle). V-sized key set: broadcastable.
        can_extend = lt_t.select(F.col("sid").alias("x")).distinct()

        # p2: increasing-wedge counts per (v1, x); prune v1 that cannot
        # close (the cached closing table serves keys AND arrays)
        e1 = lt_t.select(F.col("sid").alias("v1"), F.col("tid").alias("mid"))
        e2 = lt_t.select(F.col("sid").alias("mid"), F.col("tid").alias("x"))
        p = e1.join(closing_t.select("v1"), "v1", "left_semi").join(e2, "mid")
        if n == 4:
            p = p.join(can_extend, "x", "left_semi")
        p = p.groupBy("v1", "x").agg(F.count(F.lit(1)).alias("cnt"))

        # chain extensions: p(k) -> p(k+1), k = 2..n-3; on the LAST
        # extension the same dead-end prune applies to the new endpoint
        step = lt_t.select(F.col("sid").alias("x"), F.col("tid").alias("y"))
        for lvl in range(n - 4):
            ext = p.join(step, "x")
            if lvl == n - 5:
                ext = ext.join(can_extend.withColumnRenamed("x", "y"),
                               "y", "left_semi")
            p = (ext.groupBy("v1", F.col("y").alias("x"))
                 .agg(F.sum("cnt").alias("cnt")))

        # close: |A+(x) ∩ C(v1)| per surviving pair, weighted by cnt
        adj = lt_t.groupBy("sid").agg(
            F.sort_array(F.collect_list("tid")).alias("nbrs_a"))
        a_x = adj.select(F.col("sid").alias("x"), "nbrs_a")
        cand = (p.join(closing_t, "v1").join(a_x, "x")
                .select("cnt", "nbrs_a", "nbrs_c"))

        def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from adopt_spark.algos._kernels import batch_intersect_counts

            for batch in it:
                if len(batch) == 0:
                    continue
                k_close = batch_intersect_counts(list(batch["nbrs_a"]),
                                                 list(batch["nbrs_c"]))
                cnt = batch["cnt"].to_numpy("int64")
                yield pd.DataFrame({"partial": [int((cnt * k_close).sum())]})

        partials = cand.mapInPandas(kernel, schema="partial long")
        out = partials.agg(F.coalesce(F.sum("partial"), F.lit(0))
                           .cast("long").alias("n_cycles"))
        count = int(out.collect()[0][0])
        return spark.createDataFrame([(count,)], "n_cycles long")
    finally:
        closing.unpersist()
        if own_lt:
            lt.unpersist()


def cycle4_count_cogroup(edges: DataFrame) -> DataFrame:
    """Increasing-4-cycle count; returns 1-row DF [n_cycles: long]."""
    return cycle_count_cogroup(edges, 4)


def cycle_count(edges: DataFrame, n: int, method: str = "auto") -> DataFrame:
    """n-cycle count with adaptive physical-strategy selection.

    ``auto`` measures the lt-graph's directed wedge/edge ratio
    (Σ_v indeg(v)·outdeg(v) / E — the exact row count of the DP's
    first join) with one aggregate and dispatches: sparse → the
    generated multi-join SQL plan (motifs.cycle_sql — its path
    materialization is tiny there and it skips the adjacency build);
    dense → the pair-count DP kernel above.
    """
    if method == "cogroup":
        return cycle_count_cogroup(edges, n)
    if method == "sql":
        from adopt_spark.algos.motifs import cycle_sql, run_motif
        # the engine treats edge(sid,tid) as a SET everywhere; dedupe
        # here too so SQL count(*) multiset semantics can't make the
        # strategies (and hence "auto") disagree on duplicated input
        dedup = edges.dropDuplicates(["sid", "tid"])
        out = run_motif(edges.sparkSession, dedup, cycle_sql(n))
        return out.select(F.col("n").cast("long").alias("n_cycles"))
    if method != "auto":
        raise ValueError(f"unknown method: {method}")

    lt = (edges.where(F.col("sid") < F.col("tid"))
          .dropDuplicates(["sid", "tid"])).persist()
    try:
        deg = (
            lt.select(F.col("sid").alias("v"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionAll(lt.select(F.col("tid").alias("v"), F.lit(0), F.lit(1)))
            .groupBy("v").agg(F.sum("o").alias("od"), F.sum("i").alias("id"))
        )
        row = deg.agg(F.sum(F.col("od") + F.col("id")).alias("e2"),
                      F.sum(F.col("od") * F.col("id")).alias("w")).collect()[0]
        n_edges = int(row["e2"] or 0) // 2
        if n_edges == 0:
            return edges.sparkSession.createDataFrame([(0,)], "n_cycles long")
        ratio = float(row["w"] or 0.0) / n_edges
        # NOTE: the chosen plan runs over the ORIGINAL edge set — the
        # n=4/5 closing edge is a raw directed edge, which the
        # lt-filtered statistic input would lose. The cached lt set is
        # threaded into the kernel so it isn't rebuilt.
        chosen = (cycle_count_cogroup(edges, n, _lt=lt)
                  if ratio >= AUTO_WEDGE_EDGE_RATIO
                  else cycle_count(edges, n, "sql"))
        count = int(chosen.collect()[0][0])
        return edges.sparkSession.createDataFrame([(count,)], "n_cycles long")
    finally:
        lt.unpersist()
