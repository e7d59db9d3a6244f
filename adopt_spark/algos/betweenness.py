"""Betweenness centrality from a fixed pivot set (Brandes).

Exact single-source dependency accumulation (Brandes 2001) run from a
deterministic pivot set — the standard scalable estimator (Brandes &
Pich 2007): bc(v) = Σ over pivots s of δ_s(v), where δ_s is the
dependency of s on v. With pivots = all vertices this is exact
betweenness; with k pivots it is the canonical k-sample estimate,
made deterministic here by pinning the pivot set (lowest-id sources)
instead of sampling — so the DuckDB oracle can replay it exactly.

Per pivot, two phases over the cached edge layout:

  * forward (BFS levels): level d+1 = unvisited out-neighbors of
    level d; σ(v) = Σ σ(u) over level-d predecessors — one join +
    sum per level, σ exact in BIGINT.
  * backward (dependency): walking levels deepest-first,
    δ(u) = Σ over successors v of  σ(u)/σ(v) · (1 + δ(v)) —
    one join + sum per level.

Every step is an equi-join + aggregate on the vertex-sized level
frames; the edge relation shuffles once (repartition by src, cached).
Level frames are localCheckpointed — the per-pivot loop is O(ecc)
rounds, and the dense contract graph has ecc ≲ 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


def betweenness_from_pivots(
    spark: SparkSession,
    edges: DataFrame,
    pivots: list[int],
    max_levels: int = 64,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v, bc], metrics): bc(v) = Σ_s δ_s(v) over
    the DIRECTED graph for the given pivot set (v = pivot excluded
    from its own accumulation, per Brandes)."""
    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"])
         .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "src")
         .persist(StorageLevel.MEMORY_AND_DISK))
    e.count()
    vertices = (e.select(F.col("src").alias("v"))
                .unionAll(e.select(F.col("dst").alias("v")))
                .distinct().localCheckpoint(eager=True))

    bc: DataFrame | None = None
    metrics: list[dict] = []
    for s in pivots:
        # ---- forward: BFS levels with path counts
        levels: list[DataFrame] = []
        frontier = spark.createDataFrame([(int(s), 1)], "v long, sigma long") \
                        .localCheckpoint(eager=True)
        visited = frontier.select("v").localCheckpoint(eager=True)
        while len(levels) < max_levels:
            levels.append(frontier)
            nxt = (
                frontier.join(e.withColumnRenamed("src", "v"), "v")
                .groupBy(F.col("dst").alias("v"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited, "v", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            visited = visited.unionAll(nxt.select("v")) \
                             .localCheckpoint(eager=True)
            frontier = nxt
        metrics.append({"pivot": int(s), "levels": len(levels)})

        # ---- backward: dependency accumulation, deepest level first
        delta = levels[-1].select("v", F.lit(0.0).alias("delta"))
        acc = [delta] if len(levels) > 1 else []
        for d in range(len(levels) - 2, -1, -1):
            succ = (levels[d + 1].join(delta, "v")
                    .select(F.col("v").alias("dst"),
                            F.col("sigma").alias("s_sigma"),
                            F.col("delta").alias("s_delta")))
            contrib = (
                e.join(succ, "dst")
                .select(F.col("src").alias("v"),
                        ((F.lit(1.0) + F.col("s_delta")) / F.col("s_sigma"))
                        .alias("term"))
                .groupBy("v").agg(F.sum("term").alias("terms"))
            )
            delta = (
                levels[d].join(contrib, "v", "left")
                .select("v", (F.col("sigma")
                              * F.coalesce(F.col("terms"), F.lit(0.0)))
                        .alias("delta"))
                .localCheckpoint(eager=True)
            )
            acc.append(delta)
        s_deps = None
        for a in acc:
            s_deps = a if s_deps is None else s_deps.unionAll(a)
        if s_deps is None:
            continue
        s_deps = s_deps.where(F.col("v") != s)
        bc = s_deps if bc is None else \
            bc.unionAll(s_deps).groupBy("v").agg(F.sum("delta").alias("delta")) \
              .localCheckpoint(eager=True)

    e.unpersist()
    base = vertices
    if bc is None:
        return base.select("v", F.lit(0.0).alias("bc")), metrics
    out = (base.join(bc.groupBy("v").agg(F.sum("delta").alias("delta")),
                     "v", "left")
           .select("v", F.coalesce(F.col("delta"), F.lit(0.0)).alias("bc")))
    return out, metrics
