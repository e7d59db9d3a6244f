"""Strongly connected components: distributed forward-max coloring.

Algorithm (Orzan's coloring / the FW-BW family, the standard
vertex-centric SCC): repeat until no active vertices —

  1. **color**: propagate the maximum vertex id FORWARD along edges
     within the active subgraph to fixpoint; color(v) = the largest
     active vertex that reaches v.
  2. **mark**: the root r of each color class (color(r) = r) can
     reach every member; a member belongs to r's SCC iff it can reach
     r back, i.e. BACKWARD reachability from r restricted to edges
     whose endpoints share the color.
  3. marked vertices are settled (their SCC = the color class's
     mutual-reach set); remove them and iterate on the rest.

Every step is a join + max/min aggregate (map-side partial agg) over
the edge relation — the same shuffle discipline as cc.py's
large/small-star. Hub skew rides AQE skew-join splitting. Outer
rounds: one per "layer" of SCC condensation DAG peeled; each inner
propagation is O(diameter) rounds. This matches the published
vertex-centric SCC algorithms (Pregel/GraphX implementations).

Component labels are canonicalized to the MINIMUM member id, so
results are deterministic and parallelism-independent (the reference
has no SCC — north-rule link-graph surface for dependency cycles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


def _fixpoint_propagate(msgs_fn, state: DataFrame, max_iter: int) -> DataFrame:
    """Iterate state = merge(state, msgs(state)) until no row improves."""
    for _ in range(max_iter):
        state = state.localCheckpoint(eager=True)
        msgs = msgs_fn(state)
        merged = (
            state.join(msgs, "v", "left")
            .select("v", F.greatest(F.col("val"),
                                    F.coalesce(F.col("msg"), F.col("val")))
                    .alias("val"),
                    (F.coalesce(F.col("msg"), F.col("val"))
                     > F.col("val")).alias("improved"))
        ).localCheckpoint(eager=True)
        n_improved = merged.where("improved").count()
        state = merged.select("v", "val")
        if n_improved == 0:
            break
    return state


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_outer: int = 40,
    max_inner: int = 80,
) -> tuple[DataFrame, list[dict]]:
    """Returns (DataFrame[v: long, comp: long], metrics).

    ``comp`` = minimum vertex id of v's strongly connected component.
    Isolated vertices (no in/out edges within the input) are their own
    singleton SCCs.
    """
    e0 = (edges.select(F.col("sid").cast("long").alias("src"),
                       F.col("tid").cast("long").alias("dst"))
          .where(F.col("src") != F.col("dst"))
          .dropDuplicates(["src", "dst"])
          .persist(StorageLevel.MEMORY_AND_DISK))
    verts = (e0.select(F.col("src").alias("v"))
             .unionAll(e0.select(F.col("dst").alias("v")))
             .distinct().localCheckpoint(eager=True))

    settled: DataFrame | None = None
    active_v = verts
    active_e = e0
    metrics: list[dict] = []

    for outer in range(max_outer):
        active_e = active_e.localCheckpoint(eager=True)
        n_active = active_v.count()
        if n_active == 0:
            break

        # 1. forward max-color propagation to fixpoint
        def fwd_msgs(state: DataFrame, _e=active_e) -> DataFrame:
            return (_e.join(state.withColumnRenamed("v", "src"), "src")
                    .groupBy(F.col("dst").alias("v"))
                    .agg(F.max("val").alias("msg")))

        colors = _fixpoint_propagate(
            fwd_msgs, active_v.select("v", F.col("v").alias("val")), max_inner)
        colors = colors.withColumnRenamed("val", "color") \
                       .localCheckpoint(eager=True)

        # 2. backward mark from each root within its color class
        ce = (active_e
              .join(colors.select(F.col("v").alias("src"),
                                  F.col("color").alias("scolor")), "src")
              .join(colors.select(F.col("v").alias("dst"),
                                  F.col("color").alias("dcolor")), "dst")
              .where(F.col("scolor") == F.col("dcolor"))
              .select("src", "dst", F.col("scolor").alias("color"))
              .localCheckpoint(eager=True))
        mark = colors.where(F.col("v") == F.col("color")) \
                     .select("v", "color").localCheckpoint(eager=True)
        frontier = mark
        for _ in range(max_inner):
            step = (ce.join(frontier.select(F.col("v").alias("dst"),
                                            F.col("color")),
                            ["dst", "color"])
                    .select(F.col("src").alias("v"), "color").distinct())
            new = step.join(mark, ["v", "color"], "left_anti") \
                      .localCheckpoint(eager=True)
            if new.count() == 0:
                break
            mark = mark.unionAll(new).localCheckpoint(eager=True)
            frontier = new

        # 3. settle marked vertices; canonical label = min member id
        comp_min = mark.groupBy("color").agg(F.min("v").alias("comp"))
        found = mark.join(comp_min, "color").select("v", "comp") \
                    .localCheckpoint(eager=True)
        n_found = found.count()
        settled = found if settled is None else settled.unionAll(found)
        metrics.append({"outer": outer, "active": n_active,
                        "settled": n_found})

        active_v = active_v.join(found.select("v"), "v", "left_anti") \
                           .localCheckpoint(eager=True)
        av = active_v.select(F.col("v"))
        active_e = (active_e
                    .join(av.withColumnRenamed("v", "src"), "src")
                    .join(av.withColumnRenamed("v", "dst"), "dst"))

    if active_v.count() != 0:
        raise RuntimeError(
            f"SCC did not settle every vertex in {max_outer} outer rounds")

    e0.unpersist()
    out = settled if settled is not None else \
        verts.select("v", F.col("v").alias("comp"))
    return out.localCheckpoint(eager=True), metrics


def _reach_from(seeds: DataFrame, links: DataFrame,
                max_iter: int = 64) -> DataFrame:
    """Distributed reachability closure: all vertices reachable from
    the seed set over ``links(src, dst)`` (seeds included). Level-
    synchronous frontier BFS — per round one join + one anti-join, the
    frontier is vertex-sized, nothing driver-resident."""
    settled = seeds.select("v").distinct().localCheckpoint(eager=True)
    frontier = settled
    for _ in range(max_iter):
        nxt = (frontier.join(links, frontier["v"] == links["src"])
               .select(F.col("dst").alias("v")).distinct()
               .join(settled, "v", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        settled = settled.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled


def bowtie_decomposition(spark: SparkSession, edges: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """Broder-style bow-tie structure of a digraph -> one row
    (n_vertices, core_size, in_size, out_size, other_size):

      * core  — the giant SCC (largest; ties broken by min label);
      * IN    — vertices reaching the core but not in it;
      * OUT   — vertices the core reaches, not in it;
      * other — tendrils, tubes, and disconnected pieces.

    IN and OUT are disjoint by construction (a vertex in both would be
    mutually reachable with the core, hence inside it). Composition of
    the engine's own kernels: SCC (forward-max coloring) + two
    frontier-BFS reachability closures (forward from the core, and
    forward over the REVERSED edge list for the IN set).
    """
    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"])
         .persist(StorageLevel.MEMORY_AND_DISK))
    labels, _ = strongly_connected_components(spark, edges)
    giant = (labels.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
             .orderBy(F.desc("sz"), F.asc("comp")).limit(1))
    core = labels.join(giant.select("comp"), "comp").select("v") \
                 .localCheckpoint(eager=True)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = _reach_from(core, e, max_iter)
    bwd = _reach_from(core, rev, max_iter)
    n = (e.select(F.col("src").alias("v"))
         .unionAll(e.select(F.col("dst").alias("v")))
         .distinct().count())
    core_n = core.count()
    out_n = fwd.join(core, "v", "left_anti").count()
    in_n = bwd.join(core, "v", "left_anti").count()
    e.unpersist()
    return spark.createDataFrame(
        [(n, core_n, in_n, out_n, n - core_n - in_n - out_n)],
        "n_vertices long, core_size long, in_size long, "
        "out_size long, other_size long")
