"""Triangle counting — the reference's 3-clique flagship query.

Reference semantics (graph_query/3_clique.sql:1): count triples
a < b < c with directed edges (a,b), (b,c), (a,c) all present, i.e.
the id-ordered triangle count of the ``sid < tid``-filtered edge
table. The reference executes this with an adaptive worst-case-optimal
leapfrog triejoin (joining/join/wcoj/HyperCubeEvaluationTask.java);
we provide two Spark-native physical strategies that return the exact
same count:

  * ``method="join"`` — declarative: two self-joins over the
    degree-oriented edge DAG. Catalyst/AQE pick broadcast vs
    sort-merge and split skewed partitions; degree orientation bounds
    every out-list by O(sqrt(E)), the statically-optimal attribute
    order the reference learns at runtime via UCT (report Table 2,
    "optimal order" column). Scales to any edge count.
  * ``method="csr"`` — the leapfrog recast as a broadcast-CSR kernel:
    the oriented adjacency (CSR indptr/indices + a sorted edge-key
    array, the trie analogue of LFTJiter.java:81-197) is broadcast to
    every worker; edges stream through mapInPandas and each Arrow
    batch does fully-vectorized wedge generation + sorted membership
    tests (np.searchsorted — the galloping seek of
    LFTJoin.java:113-145, batched). Zero shuffle after the adjacency
    build, work *and* data-movement proportional to the wedge count
    on the worker side only.

  * ``method="cogroup"`` — the arbitrary-scale leapfrog: no driver
    collect, no broadcast. Sorted adjacency arrays are built with one
    ``groupBy(src)`` shuffle (each array ≤ O(sqrt(E)) by orientation),
    joined back to the edge list on both endpoints, and a mapInPandas
    kernel intersects the two sorted arrays per edge — the whole Arrow
    batch in two np.searchsorted calls via per-row key offsetting.
    This is SURVEY.md §4.3's "leapfrog-as-cogroup": it ships strictly
    less shuffle data than the wedge join (adjacency copies instead of
    materialized wedge rows, and the closure test never crosses the
    wire), and AQE skew-join splits any hub-heavy partition.

Broadcast-vs-shuffle selection: the CSR kernel needs the oriented
edge set on each worker (8 bytes × 2 × E). Above
``CSR_BROADCAST_MAX_EDGES`` it falls back to the cogroup plan — the
same decision Catalyst makes between broadcast and sort-merge joins.

Both methods run on the undirected pair set {a,b} induced by the
lt-filter, so they agree with each other and with the SQL oracle by
construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from adopt_spark.edges import orient_by_degree

# Broadcast regime bound. 25M oriented edges ≈ 400 MB driver-side
# through Arrow->pandas->numpy (2 int64 cols plus conversion copies):
# safe on a normal cluster driver, and it is also roughly where the
# builder's measurements put the csr/cogroup crossover — beyond this
# the distributed cogroup plan wins anyway, so nothing is lost by
# falling back.
CSR_BROADCAST_MAX_EDGES = 25_000_000


def _lt_pairs(edges: DataFrame) -> DataFrame:
    """The reference's per-alias ``sid < tid`` pre-filter
    (indexing/Indexer.java:96-118 builds exactly this filtered table)."""
    return edges.where(F.col("sid") < F.col("tid")).dropDuplicates(["sid", "tid"])


def triangle_count_join(edges: DataFrame,
                        _oriented: DataFrame | None = None) -> DataFrame:
    """Pure-DataFrame triangle count; returns 1-row DF [n_triangles: long].

    Plan shape: orient → wedge join (e1.dst = e2.src) → close with a
    join back to the oriented edge set on both endpoints. With degree
    orientation the wedge fan-out per vertex is O(sqrt(E)) — worst-case
    optimal for triangle listing.
    """
    o = _oriented if _oriented is not None else orient_by_degree(_lt_pairs(edges))
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, ["a", "c"])
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


_I32_LO, _I32_HI = -(2 ** 31), 2 ** 31 - 1

# Mean oriented-adjacency length at or below which the cogroup kernel
# stays JVM-side (array_intersect in codegen) instead of crossing into
# the numpy batch kernel. Measured crossover on this workload class is
# well above this; 32 keeps the JVM path to the clearly-sparse regime.
_JVM_INTERSECT_MAX_MEAN_LEN = 32.0


def triangle_count_cogroup(edges: DataFrame,
                           _oriented: DataFrame | None = None) -> DataFrame:
    """Distributed leapfrog triangle count; returns [n_triangles: long].

    Works at any edge count: nothing is collected to the driver and
    nothing is broadcast. Physical plan:

      1. orient → ``groupBy(src).agg(sort_array(collect_list(dst)))``
         builds the sorted adjacency table (the distributed analogue of
         the reference's cached trie orders, LFTJiter.java:81-197);
         every array is ≤ O(sqrt(E)) long by degree orientation, so no
         single group can blow an executor. The table is persisted and
         probed once for two *adaptive* physical choices (below).
      2. join the oriented edges (u, v) to the adjacency table on both
         endpoints (sort-merge/shuffled-hash; AQE splits skew). Only
         the SECOND join re-shuffles adjacency arrays — the first
         join's output rides in-stage into it — so the join ORDER
         decides the wire bytes: u-side first ships N+(u) once per
         edge (Σ_u outdeg(u)² elements), v-side first ships N+(v)
         once per edge (Σ_v indeg(v)·outdeg(v) elements). One degree
         aggregate computes both sums and the plan takes the cheaper
         side — the engine-level analogue of the reference's adaptive
         join-order scheduling (it learns per-attribute orders via
         UCT; we measure the one statistic that separates the two
         physical orders and dispatch on it).
      3. count |N+(u) ∩ N+(v)| per edge, dispatched on the probed mean
         adjacency length: sparse regime → JVM ``array_intersect``
         inside whole-stage codegen (no Arrow crossing at all); dense
         regime → mapInPandas numpy kernel — per Arrow batch,
         concatenate the pool arrays, lift each row's values into a
         disjoint key range (value + row * M), and one np.searchsorted
         of the candidate keys against that globally-sorted array is
         the leapfrog seek for the whole batch. Only per-edge counts
         leave the kernel.

    Id-width narrowing: the same probe reads the global id bounds off
    the persisted adjacency; when every id fits int32 the shuffled
    arrays and endpoints are cast to int, halving the bytes of every
    wire term above (dictionary-encoded graphs — this engine's own
    corpus pipeline — always qualify). The kernel is dtype-agnostic.

    The count is materialized inside the function (the adjacency cache
    must outlive the job that uses it); a local 1-row DataFrame is
    returned, matching triangle_count_auto.
    """
    # Persist the orientation when we build it ourselves: it feeds
    # THREE consumers (adjacency build, in-degree probe, the edge side
    # of the kernel join), and orientation itself costs a distinct +
    # degree join over the full edge set — recomputing it per consumer
    # tripled the kernel's wall time at scaling size (measured 471s →
    # the orientation alone is ~150s at local[2]).
    own_o = _oriented is None
    o = _oriented if _oriented is not None else \
        orient_by_degree(_lt_pairs(edges)).persist()
    spark = o.sparkSession
    adj = (o.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
           .persist())
    # one probe job: id bounds (int32 narrowing) + both join-order costs
    deg = adj.select("src", F.size("nbrs").alias("od"),
                     F.array_min("nbrs").alias("lo"),
                     F.array_max("nbrs").alias("hi"))
    indeg = o.groupBy(F.col("dst").alias("src")).agg(
        F.count(F.lit(1)).alias("id_"))
    probe = (deg.join(indeg, "src", "left").agg(
        F.min(F.least("src", "lo")).alias("lo"),
        F.max(F.greatest("src", "hi")).alias("hi"),
        F.sum(F.col("od") * F.col("od")).alias("cost_u"),
        F.sum(F.coalesce(F.col("id_"), F.lit(0)) * F.col("od"))
         .alias("cost_v"),
        F.count(F.lit(1)).alias("n_adj"),
        F.sum("od").alias("n_edges"),
    ).collect()[0])
    if probe["lo"] is None:          # empty oriented edge set
        adj.unpersist()
        if own_o:
            o.unpersist()
        return spark.createDataFrame([(0,)], "n_triangles long")
    fits32 = _I32_LO <= probe["lo"] and probe["hi"] <= _I32_HI
    idt = "int" if fits32 else "long"
    adj_t = adj.select(F.col("src").cast(idt).alias("src"),
                       F.col("nbrs").cast(f"array<{idt}>").alias("nbrs"))
    au = adj_t.select(F.col("src").alias("u"), F.col("nbrs").alias("nbrs_u"))
    av = adj_t.select(F.col("src").alias("v"), F.col("nbrs").alias("nbrs_v"))
    euv = o.select(F.col("src").cast(idt).alias("u"),
                   F.col("dst").cast(idt).alias("v"))
    if int(probe["cost_u"] or 0) <= int(probe["cost_v"] or 0):
        e = euv.join(au, "u").join(av, "v").select("nbrs_u", "nbrs_v")
    else:
        e = euv.join(av, "v").join(au, "u").select("nbrs_u", "nbrs_v")

    # Kernel dispatch on the probed mean adjacency length: short arrays
    # (sparse regime, e.g. web-scale link graphs after orientation) stay
    # entirely JVM-side — array_intersect inside whole-stage codegen
    # rides the join output with zero Arrow transfer, measured ~2x
    # faster AND better core-scaling than the Python kernel at mean
    # length ~3. Long arrays (dense regime — the kernel's home turf)
    # go to the numpy batched-galloping kernel, whose one-searchsorted-
    # per-batch amortization is what beats element-at-a-time JVM
    # evaluation when arrays hold hundreds of elements.
    mean_len = (float(probe["n_edges"]) / float(probe["n_adj"])
                if probe["n_adj"] else 0.0)
    if mean_len <= _JVM_INTERSECT_MAX_MEAN_LEN:
        n = (e.select(F.size(F.array_intersect("nbrs_u", "nbrs_v"))
                      .alias("c"))
             .agg(F.coalesce(F.sum("c"), F.lit(0))
                  .cast("long").alias("n_triangles")).collect()[0][0])
    else:
        def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from adopt_spark.algos._kernels import batch_intersect_counts

            for batch in it:
                if len(batch) == 0:
                    continue
                counts = batch_intersect_counts(list(batch["nbrs_u"]),
                                                list(batch["nbrs_v"]))
                yield pd.DataFrame({"partial": [int(counts.sum())]})

        partials = e.mapInPandas(kernel, schema="partial long")
        n = partials.agg(F.coalesce(F.sum("partial"), F.lit(0))
                         .cast("long").alias("n_triangles")).collect()[0][0]
    adj.unpersist()
    if own_o:
        o.unpersist()
    return spark.createDataFrame([(int(n),)], "n_triangles long")


def triangle_count_csr(edges: DataFrame,
                       _oriented: DataFrame | None = None) -> DataFrame:
    """Broadcast-CSR leapfrog triangle count; returns [n_triangles: long].

    Physical plan: build the degree-oriented edge list once (two
    shuffles: canonicalize + degree join), pull it to the driver as
    numpy (bounded by CSR_BROADCAST_MAX_EDGES), broadcast
    (indptr, indices, sorted-edge-keys), then one shuffle-free
    mapInPandas pass over the oriented edges: per Arrow batch,
      1. expand each edge (u,v) into candidate wedges (v, w) for
         w ∈ N+(u)   — vectorized repeat/cumsum, no Python loop;
      2. membership-test all candidate keys against the sorted edge
         key array in one np.searchsorted call (the leapfrog seek);
    and emit one partial count per batch. Final agg sums partials.

    ``_oriented`` (optional, from triangle_count_auto): a pre-built
    degree-oriented deduped edge set [src, dst] — skips re-orienting.

    The CSR itself comes from cliques.build_oriented_csr (ONE shared
    implementation of the bound probe, id/sign guards, orientation and
    sorted-key build for every broadcast kernel); out-of-regime or
    empty inputs fall back to the distributed cogroup plan.
    """
    from adopt_spark.algos.cliques import build_oriented_csr

    spark = edges.sparkSession
    csr = build_oriented_csr(edges, _oriented=_oriented)
    if csr is None:   # empty (cogroup returns 0) or beyond broadcast regime
        return triangle_count_cogroup(edges, _oriented=_oriented)

    sc = spark.sparkContext
    b = sc.broadcast(csr)
    m = csr.m
    n_edges = len(csr.src)
    n_slices = max(sc.defaultParallelism * 4, 8)   # slices ≫ cores: work stealing
    bounds = np.linspace(0, n_edges, n_slices + 1).astype(np.int64)
    slices = spark.createDataFrame(
        [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_slices)],
        "lo long, hi long",
    ).repartition(n_slices)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        csr_l = b.value
        k, us, ip = csr_l.keys, csr_l.usrc, csr_l.indptr
        s, d = csr_l.src, csr_l.dst
        for batch in it:
            out = []
            for lo, hi in zip(batch["lo"], batch["hi"]):
                u, v = s[lo:hi], d[lo:hi]
                pos = np.searchsorted(us, u)      # every u has out-edges
                starts, ends = ip[pos], ip[pos + 1]
                counts = ends - starts
                total = int(counts.sum())
                if total == 0:
                    out.append(0)
                    continue
                # ragged gather: offsets into d for all wedges of the slice
                base = np.repeat(starts, counts)
                step = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(counts) - counts, counts)
                w = d[base + step]
                cand = np.repeat(v, counts) * m + w
                idx = np.searchsorted(k, cand)
                idx[idx == len(k)] = 0
                found = (k[idx] == cand)
                out.append(int(found.sum()))
            yield pd.DataFrame({"partial": out})

    partials = slices.mapInPandas(kernel, schema="partial long")
    return partials.agg(F.coalesce(F.sum("partial"), F.lit(0))
                        .cast("long").alias("n_triangles"))


# Auto-dispatch threshold on the wedge/edge ratio W/E where
# W = Σ_v C(outdeg+(v), 2) over the oriented graph. The kernels pay
# O(E) Arrow/broadcast overhead to avoid shuffling O(W) wedge rows, so
# they win when W ≫ E. Measured on local[32]: dense derived graph
# (W/E = 88) — csr 4.6s vs join 11s; sparse 45M-edge Chung-Lu
# (W/E = 0.98) — join 49s vs kernels ~205s. 8 splits the regimes.
AUTO_WEDGE_EDGE_RATIO = 8.0


def triangle_count_auto(edges: DataFrame) -> DataFrame:
    """Adaptive strategy selection — the engine-level analogue of the
    reference's runtime adaptivity (it *learns* the cheapest attribute
    order per query; we *measure* the one statistic that separates the
    physical strategies and dispatch on it).

    One cheap aggregate over the oriented out-degree distribution gives
    the exact wedge count W. W/E below AUTO_WEDGE_EDGE_RATIO → the
    wedge self-join (its shuffles are proportional to W, tiny on sparse
    graphs); above → the leapfrog kernels (broadcast CSR while the edge
    list fits a worker, cogroup beyond). The oriented edge set is built
    once and shared with the chosen plan.
    """
    spark = edges.sparkSession
    o = orient_by_degree(_lt_pairs(edges)).persist()
    try:
        row = (
            o.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum("d").alias("e"),
                 F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()[0]
        )
        n_edges = int(row["e"] or 0)
        if n_edges == 0:
            return spark.createDataFrame([(0,)], "n_triangles long")
        ratio = float(row["w"] or 0.0) / n_edges
        if ratio < AUTO_WEDGE_EDGE_RATIO:
            chosen = triangle_count_join(edges, _oriented=o)
        elif n_edges <= CSR_BROADCAST_MAX_EDGES:
            chosen = triangle_count_csr(edges, _oriented=o)
        else:
            chosen = triangle_count_cogroup(edges, _oriented=o)
        # materialize while the shared oriented cache is alive, so the
        # finally-unpersist can't force a recompute for the caller
        n = int(chosen.collect()[0][0])
        return spark.createDataFrame([(n,)], "n_triangles long")
    finally:
        o.unpersist()


def triangle_count(edges: DataFrame, method: str = "auto") -> DataFrame:
    if method == "auto":
        return triangle_count_auto(edges)
    if method == "join":
        return triangle_count_join(edges)
    if method == "csr":
        return triangle_count_csr(edges)
    if method == "cogroup":
        return triangle_count_cogroup(edges)
    raise ValueError(f"unknown method: {method}")


# -- DOULION sampled triangle estimation (Tsourakakis et al., KDD'09)

DOULION_A, DOULION_B, DOULION_M = 1_103_515_245, 12_345, 2_147_483_648


def triangle_count_sampled(edges: DataFrame, p_pct: int) -> DataFrame:
    """Unbiased triangle estimate from a p% DETERMINISTIC edge sample.

    DOULION: keep each undirected edge independently with probability
    p, count triangles among survivors, scale by (1/p)^3. The coin is
    an LCG gate on the canonical (min,max) pair — replayable at any
    parallelism and replicable in SQL, so the whole estimate is
    value-checkable (a rand() sample would be neither). At 100 TB the
    sample pass is one filtered scan; the triangle count then runs on
    a p³-smaller problem. Exact count rides along at test scale to
    expose the estimator error.

    Output: (sampled_edges, sampled_triangles, estimate,
    exact_triangles).
    """
    if not 0 < p_pct <= 100:
        raise ValueError(f"p_pct must be in (0, 100], got {p_pct}")
    und = (edges.select(
        F.least("sid", "tid").alias("a"),
        F.greatest("sid", "tid").alias("b"))
        .where(F.col("a") != F.col("b")).distinct())
    gate = ((F.col("a") * DOULION_A + F.col("b") * DOULION_B)
            % DOULION_M) % 100 < p_pct
    # no explicit cache: the consumer materializes once; callers that
    # reuse the sample at scale should persist the returned frame
    samp = und.where(gate)

    def tri(pairs: DataFrame) -> DataFrame:
        e1 = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = pairs.select(F.col("a").alias("x"), F.col("b").alias("z"))
        e3 = pairs.select(F.col("a").alias("y"), F.col("b").alias("z"))
        return (e1.join(e2, "x").where(F.col("y") < F.col("z"))
                .join(e3, ["y", "z"])
                .agg(F.count(F.lit(1)).alias("n")))

    scale = (100.0 / p_pct) ** 3
    out = (samp.agg(F.count(F.lit(1)).alias("sampled_edges"))
           .crossJoin(tri(samp).withColumnRenamed("n",
                                                  "sampled_triangles"))
           .crossJoin(tri(und).withColumnRenamed("n",
                                                 "exact_triangles"))
           .select("sampled_edges", "sampled_triangles",
                   F.round(F.col("sampled_triangles") * F.lit(scale), 4)
                   .alias("estimate"),
                   "exact_triangles"))
    return out


def triangle_count_sampled_sql(edge_cte: str, p_pct: int) -> str:
    """DuckDB twin of :func:`triangle_count_sampled`."""
    a, b, m = DOULION_A, DOULION_B, DOULION_M
    scale = (100.0 / p_pct) ** 3
    tri = ("SELECT count(*) AS n FROM {t} e1, {t} e2, {t} e3 "
           "WHERE e2.a = e1.a AND e1.b < e2.b "
           "AND e3.a = e1.b AND e3.b = e2.b")
    return f"""
WITH edge AS (
{edge_cte}
), und AS (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), samp AS (
    SELECT a, b FROM und
    WHERE ((a * {a} + b * {b}) % {m}) % 100 < {p_pct}
), st AS ({tri.format(t='samp')}), et AS ({tri.format(t='und')})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS sampled_edges,
       CAST(st.n AS BIGINT) AS sampled_triangles,
       round(st.n * {scale!r}, 4) AS estimate,
       CAST(et.n AS BIGINT) AS exact_triangles
FROM st CROSS JOIN et
""".strip()


def triangle_count_incremental(edges: DataFrame, new_flag) -> DataFrame:
    """Incremental triangle maintenance: given the merged edge table
    and a Column flagging NEWLY-INSERTED edges, count the triangles
    the delta created by probing ONLY the delta edges against the
    full adjacency — work proportional to |delta| x degree, never a
    full recount (the streaming-graph view-maintenance primitive).

    Each new triangle contains >= 1 delta edge, so enumerating
    common neighbors of every delta edge finds each new triangle
    once per delta edge it contains; the id-ordered triple dedup
    collapses multi-delta triangles exactly. Base count rides along
    by difference from the (independently oracle-checked) cogroup
    kernel. Output one row: (n_edges, n_delta_edges,
    n_new_triangles, n_base_triangles, n_total_triangles).

    ``new_flag``: boolean Column over (sid, tid) of the lt-canonical
    pair — deterministic on both engines (the contract uses
    (sid + tid) % 10 = 0).
    """
    lt = (edges.select(F.least("sid", "tid").alias("a"),
                       F.greatest("sid", "tid").alias("b"))
          .where(F.col("a") != F.col("b")).distinct()
          .withColumn("new", new_flag)
          .localCheckpoint(eager=True))
    adj = (lt.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
           .unionAll(lt.select(F.col("b").alias("v"),
                               F.col("a").alias("nbr")))
           .groupBy("v")
           .agg(F.sort_array(F.collect_set("nbr")).alias("adj")))
    delta = lt.where("new")
    probe = (delta
             .join(adj.select(F.col("v").alias("a"),
                              F.col("adj").alias("adj_a")), "a")
             .join(adj.select(F.col("v").alias("b"),
                              F.col("adj").alias("adj_b")), "b")
             .select("a", "b",
                     F.explode(F.array_intersect("adj_a", "adj_b"))
                     .alias("c")))
    triples = (probe.select(
        F.least(F.least("a", "b"), "c").alias("x"),
        F.greatest(F.greatest("a", "b"), "c").alias("z"),
        (F.col("a") + F.col("b") + F.col("c")
         - F.least(F.least("a", "b"), "c")
         - F.greatest(F.greatest("a", "b"), "c")).alias("y"))
        .select("x", "y", "z").distinct())
    n_new = triples.agg(F.count(F.lit(1)).alias("n_new_triangles"))
    total = triangle_count(lt.select(F.col("a").alias("sid"),
                                     F.col("b").alias("tid")),
                           "cogroup").select(
        F.col("n_triangles").alias("n_total_triangles"))
    counts = lt.agg(F.count(F.lit(1)).alias("n_edges"),
                    F.sum(F.when(F.col("new"), 1).otherwise(0))
                    .cast("long").alias("n_delta_edges"))
    return (counts.crossJoin(n_new).crossJoin(total)
            .select("n_edges", "n_delta_edges",
                    F.col("n_new_triangles").cast("long")
                    .alias("n_new_triangles"),
                    (F.col("n_total_triangles")
                     - F.col("n_new_triangles")).cast("long")
                    .alias("n_base_triangles"),
                    F.col("n_total_triangles").cast("long")
                    .alias("n_total_triangles")))
