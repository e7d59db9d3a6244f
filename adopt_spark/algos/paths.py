"""Single-source shortest paths: hop-distance BFS + weighted SSSP.

One frontier-pruned Bellman-Ford engine serves both: with unit
weights the relaxation schedule *is* level-synchronous BFS (each
round settles exactly the next hop ring); with per-edge long weights
it is delta-free Bellman-Ford (each round relaxes every edge leaving
a vertex whose distance improved last round — the classic
frontier-pruned variant, so total work on well-behaved graphs tracks
the BFS frontier sizes, not rounds × E).

The reference is a motif-count engine with no path queries; this is
north-rule link-graph surface (reachability rings, dependency depth)
built in the same mold as algos/pagerank.py:

  * the edge relation is the ONE layout investment — weight column
    attached, hash-partitioned by src, sorted, cached; every round's
    frontier⋈links sort-merge join reuses that partitioning, so only
    the (vertex-sized) frontier moves per round.
  * per round: candidates = frontier ⋈ links → groupBy(dst).min
    (map-side partial agg), then a join against the settled distance
    vector keeps strictly-improving rows only — that difference is
    the next frontier AND the convergence test (empty → fixpoint).
  * distances merge by full-outer join on the shared hash(v)
    partitioning; the vector is repartitioned to ~100k vertices per
    partition exactly like the PageRank rank vector.
  * every round snapshots through CheckpointManager (parquet +
    per-partition lineage + metrics); ``resume=True`` restarts from
    the latest snapshot; ``localCheckpoint`` truncates the growing
    join lineage.

Distances are exact BIGINTs (hop counts, or sums of long weights), so
results are bit-stable across parallelism levels — no float compare.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager

# Deterministic synthetic edge weight used by the driver contract:
# cheap, id-mixing, representable identically in Spark and DuckDB
# (exact integer arithmetic on both sides).
CONTRACT_WEIGHT_SQL = "1 + (src * 7 + dst * 13) % 10"


def contract_weight(src: Column, dst: Column) -> Column:
    """Spark twin of CONTRACT_WEIGHT_SQL (exact long arithmetic)."""
    return F.lit(1) + F.pmod(src * F.lit(7) + dst * F.lit(13), F.lit(10))


def _weighted_links(edges: DataFrame, weighted: bool,
                    directed: bool) -> DataFrame:
    """(src, dst, w) relation shared by the distance iteration and the
    parent derivation — one definition so they can never diverge."""
    e = edges.select(F.col("sid").cast("long").alias("src"),
                     F.col("tid").cast("long").alias("dst"))
    if not directed:
        e = e.unionAll(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    e = e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    w = (contract_weight(F.col("src"), F.col("dst")) if weighted
         else F.lit(1)).cast("long")
    return e.select("src", "dst", w.alias("w"))


def shortest_path_tree(
    spark: SparkSession,
    edges: DataFrame,
    source: int | list[int] | DataFrame,
    weighted: bool = False,
    directed: bool = True,
    **kwargs,
) -> tuple[DataFrame, list[dict]]:
    """Shortest-path TREE — path reconstruction, not just distances:
    ``(DataFrame[v, dist, parent], metrics)``.

    ``parent(v)`` = the smallest u with ``dist(u) + w(u, v) == dist(v)``
    (deterministic tie-break), derived AFTER convergence by one
    dist⋈links⋈dist relaxation-equality join — no parent bookkeeping
    inside the superstep loop, so the iteration stays the lean
    distance-only shuffle. Seeds have no parent (NULL): weights are
    ≥ 1, so no relaxation edge can land on dist 0. Following parents
    from any reached v walks a shortest path back to its seed; the
    parent rows ARE the tree, one row per reached non-seed vertex.
    """
    dist, metrics = shortest_paths(spark, edges, source,
                                   weighted=weighted, directed=directed,
                                   **kwargs)
    links = _weighted_links(edges, weighted, directed)
    du = dist.select(F.col("v").alias("src"), F.col("dist").alias("du"))
    dv = dist.select(F.col("v").alias("dst"), F.col("dist").alias("dv"))
    parent = (links.join(du, "src").join(dv, "dst")
              .where(F.col("du") + F.col("w") == F.col("dv"))
              .groupBy("dst").agg(F.min("src").alias("parent"))
              .withColumnRenamed("dst", "v"))
    return dist.join(parent, "v", "left"), metrics


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    source: int | list[int] | DataFrame,
    weighted: bool = False,
    directed: bool = True,
    max_iter: int = 64,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Distances from ``source``; returns (DataFrame[v, dist], metrics).

    ``source`` may be a single vertex or a seed LIST — the multi-
    source variant computes min distance to ANY seed (the standard
    distance-to-seed-set primitive) in the same frontier schedule.
    Only REACHED vertices appear in the output (unreachable = absent,
    not NULL/inf). ``weighted=True`` attaches the deterministic
    contract weight to every directed link; ``weighted=False`` is
    plain hop-count BFS. ``directed=False`` symmetrizes first (the
    weight of a reversed link is recomputed from its own (src, dst),
    matching the SQL oracle's symmetrized relation).
    """
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    links = (
        _weighted_links(edges, weighted, directed)
        .repartition(parts, "src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    links.count()

    n_vertices = links.select(F.col("src").alias("v")).unionAll(
        links.select(F.col("dst").alias("v"))).distinct().count()
    dist_parts = max(1, min(parts, n_vertices // 100_000 + 1))

    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="sssp_ckpt_"))
    start_iter = 0
    if isinstance(source, DataFrame):
        # seed SET as a DataFrame (first column = vertex ids) — the
        # distributed form of the seed-list variant, for seed sets
        # computed by another job (e.g. per-component roots) that must
        # never round-trip through the driver.
        dist = source.select(
            F.col(source.columns[0]).cast("long").alias("v"),
            F.lit(0).cast("long").alias("dist"),
        ).distinct().repartition(dist_parts, "v")
    else:
        seeds = [int(source)] if isinstance(source, int) else \
            sorted({int(s) for s in source})
        dist = spark.createDataFrame([(s, 0) for s in seeds],
                                     "v long, dist long") \
                    .repartition(dist_parts, "v")
    frontier = dist
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        dist = cm.load(spark, cm.latest())
        # Conservative resume frontier: the full settled vector. One
        # extra no-improvement round re-derives emptiness and stops.
        frontier = dist

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        cand = (
            frontier.join(links, frontier["v"] == links["src"])
            .select(F.col("dst").alias("v"),
                    (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("v").agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, "v", "left")
            .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("v", F.col("nd").alias("dist"))
        )
        merged = (
            dist.withColumnRenamed("dist", "old")
            .join(improved.withColumnRenamed("dist", "new"), "v", "full")
            .select("v", F.coalesce(F.col("new"), F.col("old")).alias("dist"))
            .repartition(dist_parts, "v")
        )
        # save() re-reads the published snapshot, so the returned frame
        # already carries truncated lineage — no extra localCheckpoint.
        merged = cm.save(merged, it, phase="relax")
        frontier = improved.localCheckpoint(eager=True)
        n_front = frontier.count()
        dist = merged
        metrics.append({"iteration": it, "frontier": n_front,
                        "sec": round(time.time() - t0, 4)})
        if n_front == 0:
            break

    links.unpersist()
    return dist, metrics


def bfs_hops(spark: SparkSession, edges: DataFrame, source: int,
             directed: bool = False, **kw) -> tuple[DataFrame, list[dict]]:
    """Hop distance from ``source`` (unit weights)."""
    return shortest_paths(spark, edges, source, weighted=False,
                          directed=directed, **kw)


def pivot_distances(
    spark: SparkSession,
    edges: DataFrame,
    n_pivots: int = 4,
    directed: bool = True,
    max_iter: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact hop distances from the ``n_pivots`` LOWEST-id vertices ->
    (pivot, v, dist), only reached (pivot_id, v) pairs.

    One level-synchronous BFS over the composite key (pivot_id, v) — the
    standard multi-source-with-source-id trick — instead of n_pivots
    sequential sweeps: per level ONE frontier-links join + ONE
    (pivot_id, v) min-aggregate, so the level count is max eccentricity,
    not pivots x eccentricity. State is bounded by n_pivots x |V|
    rows of three longs; the links layout is cached once and reused
    across levels (same shape as shortest_paths above). Deterministic
    lowest-id pivots make the sample exactly replayable, mirroring
    betweenness.py's pivot policy.
    """
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col("sid").cast("long").alias("src"),
                     F.col("tid").cast("long").alias("dst"))
    if not directed:
        e = e.unionAll(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    e = e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    links = (e.repartition(parts, "src").sortWithinPartitions("src")
             .persist(StorageLevel.MEMORY_AND_DISK))
    links.count()

    pivots = [int(r.v) for r in
              links.select(F.col("src").alias("v"))
              .unionAll(links.select(F.col("dst").alias("v")))
              .distinct().orderBy("v").limit(n_pivots).collect()]
    dist = spark.createDataFrame([(p, p, 0) for p in pivots],
                                 "pivot_id long, v long, dist long") \
                .repartition(parts, "v")
    frontier = dist
    for _ in range(max_iter):
        cand = (frontier.join(links, frontier["v"] == links["src"])
                .select("pivot_id", F.col("dst").alias("v"),
                        (F.col("dist") + 1).alias("nd"))
                .groupBy("pivot_id", "v").agg(F.min("nd").alias("nd")))
        improved = (cand.join(dist, ["pivot_id", "v"], "left")
                    .where(F.col("dist").isNull())
                    .select("pivot_id", "v", F.col("nd").alias("dist")))
        frontier = improved.localCheckpoint(eager=True)
        if frontier.count() == 0:
            break
        dist = (dist.unionAll(frontier)
                .repartition(parts, "v")
                .localCheckpoint(eager=True))
    links.unpersist()
    return dist


def eccentricity_profile(spark: SparkSession, edges: DataFrame,
                         n_pivots: int = 4,
                         directed: bool = True) -> DataFrame:
    """Per-pivot forward eccentricity + reach -> (pivot_id, ecc,
    n_reached); max(ecc) over rows is the standard pivot lower bound
    on the directed diameter."""
    d = pivot_distances(spark, edges, n_pivots, directed)
    return (d.groupBy("pivot_id")
            .agg(F.max("dist").alias("ecc"),
                 F.count(F.lit(1)).alias("n_reached"))
            .select("pivot_id", "ecc", "n_reached"))


def harmonic_centrality(spark: SparkSession, edges: DataFrame,
                        n_pivots: int = 4,
                        directed: bool = True) -> DataFrame:
    """Pivot-sample harmonic centrality -> (v, harmonic): for each
    reached vertex v, sum over pivots of 1/d(pivot_id, v) (d > 0),
    rounded to 6 dp. Exactly replayable (deterministic pivots)."""
    d = pivot_distances(spark, edges, n_pivots, directed)
    return (d.where(F.col("dist") > 0)
            .groupBy("v")
            .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 6)
                 .alias("harmonic")))


def widest_paths(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    directed: bool = True,
    max_iter: int = 64,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Widest (max-bottleneck) paths from ``source`` on the (max, min)
    semiring: width(v) = max over paths P of min edge weight on P —
    the capacity-routing / max-reliability-path primitive, and the
    third semiring this engine's one superstep shape instantiates
    (SSSP = (min, +), BOM explosion = (+, x), widest = (max, min)).

    Same frontier-pruned schedule as shortest_paths: per superstep ONE
    frontier-links equi-join, a per-vertex max aggregate of
    least(width(u), w(u, v)), and a strict-improvement anti-filter;
    the relaxation is monotone non-decreasing and bounded by the max
    edge weight, so the fixpoint is exact. Edge weights are the
    deterministic contract law (contract_weight, 1..10). Output:
    (v, width) for every vertex REACHABLE from the source (the source
    itself is excluded — its width is the empty-path infimum, not a
    data value).
    """
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    links = (_weighted_links(edges, True, directed)
             .repartition(parts, "src")
             .persist(StorageLevel.MEMORY_AND_DISK))
    links.count()

    big = 1 << 60        # source sentinel: wider than any edge
    width = spark.createDataFrame([(int(source), big)], "v long, width long")
    frontier = width
    metrics: list[dict] = []
    for it in range(max_iter):
        t0 = time.time()
        cand = (frontier.join(links, frontier["v"] == links["src"])
                .select(F.col("dst").alias("v"),
                        F.least(F.col("width"), F.col("w")).alias("nw"))
                .groupBy("v").agg(F.max("nw").alias("nw")))
        improved = (cand.join(width, "v", "left")
                    .where(F.col("width").isNull()
                           | (F.col("nw") > F.col("width")))
                    .select("v", F.col("nw").alias("width")))
        merged = (width.withColumnRenamed("width", "old")
                  .join(improved.withColumnRenamed("width", "new"),
                        "v", "full")
                  .select("v", F.coalesce(F.col("new"), F.col("old"))
                          .alias("width"))
                  .localCheckpoint(eager=True))
        frontier = improved.localCheckpoint(eager=True)
        n_front = frontier.count()
        width = merged
        metrics.append({"iteration": it, "frontier": n_front,
                        "sec": round(time.time() - t0, 4)})
        if n_front == 0:
            break
    links.unpersist()
    return width.where(F.col("v") != int(source)), metrics
