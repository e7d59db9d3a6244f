"""k-core decomposition by incremental peeling.

North-of-reference graph surface (the reference counts motifs only):
the k-core of an undirected graph is the maximal subgraph where every
vertex has degree ≥ k. ``k_core`` peels one k; ``core_numbers``
computes the whole decomposition **incrementally**: the k-core is
peeled out of the surviving (k-1)-core, never from the original
graph, so the total work is O(E · peel-rounds) instead of
O(k_max · E) full restarts. Vertices removed while peeling toward the
k-core get core number k-1 — including vertices whose degree drops to
zero mid-cascade (tracked against the surviving vertex set, since a
vertex with no remaining edges vanishes from the edge list entirely).

Every peel round is two partial-aggregated shuffles (degree groupBy +
two anti-joins) and exactly one counting action; edge/vertex sets are
checkpointed per round (lineage truncation). Deterministic and
parallelism-independent.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.checkpoint import CheckpointManager


def _sym(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
    rev = edges.select(F.col("tid").alias("u"), F.col("sid").alias("v"))
    return fwd.unionAll(rev).where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def k_core(spark: SparkSession, edges: DataFrame, k: int,
           max_iter: int = 100) -> DataFrame:
    """Vertices of the k-core: DataFrame[v: long]."""
    e = _sym(edges).localCheckpoint(eager=True)
    cm = CheckpointManager(tempfile.mkdtemp(prefix="kcore_"))
    prev_edges: int | None = None
    for it in range(max_iter):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("u")
        new_e = (
            e.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
        )
        new_e = cm.save(new_e, it)            # materializes: the round's one job
        n_new = new_e.count()                 # cheap count on parquet output
        e = new_e
        if n_new == prev_edges or n_new == 0:
            break
        prev_edges = n_new
    return e.select(F.col("u").alias("v")).distinct()


def core_numbers(spark: SparkSession, edges: DataFrame,
                 max_rounds: int = 10_000) -> DataFrame:
    """Core number per vertex: DataFrame[v: long, core: int].

    Incremental peel: stage k removes (cascading) vertices of degree
    < k from the surviving (k-1)-core, assigning them core k-1; the
    stage ends when the k-core is stable, then k advances. Every
    vertex with at least one non-loop edge gets core ≥ 1.
    """
    e = _sym(edges).localCheckpoint(eager=True)
    alive = e.select(F.col("u").alias("v")).distinct().localCheckpoint(eager=True)
    result = spark.createDataFrame([], "v long, core int")
    k = 1
    done = False
    for _ in range(max_rounds):
        deg = (e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
               .withColumnRenamed("u", "v"))
        degf = alive.join(deg, "v", "left").select(
            "v", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
        low = degf.where(F.col("deg") < k).select("v").localCheckpoint(eager=True)
        n_low = low.count()
        if n_low == 0:
            # k-core stable; if it is empty we are done, else advance k
            if alive.isEmpty():
                done = True
                break
            k += 1
            continue
        result = result.unionByName(
            low.select("v", F.lit(k - 1).cast("int").alias("core"))
        ).localCheckpoint(eager=True)
        alive = alive.join(low, "v", "left_anti").localCheckpoint(eager=True)
        e = (
            e.join(low.withColumnRenamed("v", "u"), "u", "left_anti")
            .join(low, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not done and not alive.isEmpty():
        # never return a silently-partial decomposition
        raise RuntimeError(
            f"core_numbers did not converge within max_rounds={max_rounds}; "
            "raise max_rounds for this graph")
    return result


def onion_layers(spark: SparkSession, edges: DataFrame,
                 max_rounds: int = 10_000) -> DataFrame:
    """Onion decomposition (core-periphery structure): every peel
    BATCH of the k-core cascade is one layer — vertices removed
    together (same stage k, same simultaneous round) share a layer,
    and the layer index increases from the graph's periphery to its
    densest core (Hebert-Dufresne et al.'s refinement of the k-core
    number). Output: DataFrame[v: long, core: int, layer: int].

    Same incremental-peel plan as :func:`core_numbers` (two
    partial-aggregated shuffles + one counting action per round,
    checkpointed survivors); the layer counter advances only on
    non-empty batches, which the SQL oracle reproduces with a
    dense_rank over non-empty unrolled rounds."""
    e = _sym(edges).localCheckpoint(eager=True)
    alive = (e.select(F.col("u").alias("v"))
             .distinct().localCheckpoint(eager=True))
    result = spark.createDataFrame([], "v long, core int, layer int")
    k = 1
    layer = 0
    done = False
    for _ in range(max_rounds):
        deg = (e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
               .withColumnRenamed("u", "v"))
        degf = alive.join(deg, "v", "left").select(
            "v", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
        low = (degf.where(F.col("deg") < k).select("v")
               .localCheckpoint(eager=True))
        n_low = low.count()
        if n_low == 0:
            if alive.isEmpty():
                done = True
                break
            k += 1
            continue
        layer += 1
        result = result.unionByName(
            low.select("v", F.lit(k - 1).cast("int").alias("core"),
                       F.lit(layer).cast("int").alias("layer"))
        ).localCheckpoint(eager=True)
        alive = alive.join(low, "v", "left_anti").localCheckpoint(eager=True)
        e = (
            e.join(low.withColumnRenamed("v", "u"), "u", "left_anti")
            .join(low, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not done and not alive.isEmpty():
        raise RuntimeError(
            f"onion_layers did not converge within max_rounds="
            f"{max_rounds}; raise max_rounds for this graph")
    return result
