"""Connected components: large-star / small-star hash-min.

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond"): alternate two vertex-local rewrites of the edge set until
fixpoint, at which point the edges form a star forest with every
vertex pointing at its component's minimum id.

  * large-star(u): m = min({u} ∪ N(u)); replace each (u, v) with
    v > u by (v, m).
  * small-star(u): over lower neighbors N<(u); m = min(N<(u));
    emit (v, m) for v ∈ N<(u) ∪ {u}, v ≠ m.

Both are one shuffle each (groupBy(u).min + re-key) — O(log n) rounds
on any graph, robust to supernode components (the min aggregate is
partially aggregated map-side, so a 10^9-vertex component never
funnels raw rows to one reducer).

The reference has no CC (pure motif-count engine); this is north-rule
surface. Convergence detection uses (count, xxhash64-sum) of the edge
set — an O(1)-state fingerprint instead of a full set-difference join.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.checkpoint import CheckpointManager


def _symmetrize(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
    rev = edges.select(F.col("tid").alias("u"), F.col("sid").alias("v"))
    return fwd.unionAll(rev).where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def _large_star(e: DataFrame) -> DataFrame:
    both = _symmetrize(e)
    mins = both.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("sid"), F.col("m").alias("tid"))
        .where(F.col("sid") != F.col("tid"))
        .dropDuplicates(["sid", "tid"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    both = _symmetrize(e)
    lower = both.where(F.col("v") < F.col("u"))
    mins = lower.groupBy("u").agg(F.min("v").alias("m"))
    from_lower = lower.join(mins, "u").select(F.col("v").alias("sid"),
                                              F.col("m").alias("tid"))
    from_self = mins.select(F.col("u").alias("sid"), F.col("m").alias("tid"))
    return (
        from_lower.unionAll(from_self)
        .where(F.col("sid") != F.col("tid"))
        .dropDuplicates(["sid", "tid"])
    )


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: exact and overflow-proof under ANSI mode
    h = F.sum(F.xxhash64("sid", "tid").cast("decimal(38,0)"))
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(h, F.lit(0)).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame[v: long, component: long], metrics).

    ``component`` is the minimum vertex id of each component — exact,
    deterministic, parallelism-independent.
    """
    e0 = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
              .where(F.col("sid") != F.col("tid")).dropDuplicates(["sid", "tid"])
    vertices = (
        e0.select(F.col("sid").alias("v"))
        .unionAll(e0.select(F.col("tid").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="cc_ckpt_"))
    start_iter = 0
    e = e0
    if resume and cm.latest() is not None:
        start_iter = cm.latest() + 1
        e = cm.load(spark, cm.latest())
    e = e.localCheckpoint(eager=True)

    metrics: list[dict] = []
    prev_fp = _fingerprint(e)
    for it in range(start_iter, max_iter):
        t0 = time.time()
        e = _small_star(_large_star(e))
        e = cm.save(e, it, phase="large+small")
        fp = _fingerprint(e)
        metrics.append({"iteration": it, "edges": fp[0],
                        "sec": round(time.time() - t0, 4)})
        if fp == prev_fp:
            break
        prev_fp = fp

    # e is now a star forest: (v, root). Roots + isolated originals map to self.
    labels = e.select(F.col("sid").alias("v"), F.col("tid").alias("component"))
    covered = labels.select("v")
    roots = vertices.join(covered, "v", "left_anti") \
                    .select("v", F.col("v").alias("component"))
    return labels.unionAll(roots), metrics


def cc_incremental(spark: SparkSession, base_edges: DataFrame,
                   delta_edges: DataFrame,
                   base_labels: DataFrame | None = None,
                   ) -> tuple[DataFrame, dict]:
    """Incremental CC maintenance under an edge-insertion batch:
    instead of re-labelling the whole graph, contract the delta onto
    the existing labels and run the star kernel on the CONTRACTED
    graph — whose size is the delta batch, not the base graph.

      1. label the base graph once (or accept cached ``base_labels``),
      2. map each delta endpoint to its base component (delta-only
         vertices are their own components),
      3. hash-min CC over the contracted (comp_a, comp_b) edges —
         O(|delta|) state, base-size-independent,
      4. one relabel join pushes the merged roots back to vertices.

    Because component ids are minimum vertex ids at every stage, the
    composition yields exactly the from-scratch labels (min is
    associative over the merge tree) — the oracle can therefore be an
    independent full recompute. Returns ([v, component], stats).
    """
    if base_labels is None:
        base_labels, _ = connected_components(spark, base_edges)
    base_labels = base_labels.localCheckpoint(eager=True)

    d = (delta_edges.select(F.col("sid").cast("long"),
                            F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid")))
    la = base_labels.select(F.col("v").alias("sid"),
                            F.col("component").alias("ca"))
    lb = base_labels.select(F.col("v").alias("tid"),
                            F.col("component").alias("cb"))
    mapped = (d.join(la, "sid", "left").join(lb, "tid", "left")
              .select(F.coalesce("ca", "sid").alias("ca"),
                      F.coalesce("cb", "tid").alias("cb"))
              .where(F.col("ca") != F.col("cb")))
    contracted = mapped.select(F.col("ca").alias("sid"),
                               F.col("cb").alias("tid")).distinct()
    n_contracted = contracted.count()
    if n_contracted == 0:
        # the delta closed no new connections: labels are unchanged,
        # except delta-only vertices become their own components
        extra = (d.select(F.col("sid").alias("v"))
                 .unionAll(d.select(F.col("tid").alias("v"))).distinct()
                 .join(base_labels.select("v"), "v", "left_anti")
                 .select("v", F.col("v").alias("component")))
        return base_labels.unionByName(extra), {"contracted_edges": 0}

    merge, _ = connected_components(spark, contracted)
    rename = merge.select(F.col("v").alias("component"),
                          F.col("component").alias("new_c"))
    relabeled = (base_labels.join(rename, "component", "left")
                 .select("v", F.coalesce("new_c", "component")
                         .alias("component")))
    extra = (d.select(F.col("sid").alias("v"))
             .unionAll(d.select(F.col("tid").alias("v"))).distinct()
             .join(base_labels.select("v"), "v", "left_anti"))
    extra_lab = (extra.join(rename.withColumnRenamed("component", "v"),
                            "v", "left")
                 .select("v", F.coalesce("new_c", "v").alias("component")))
    return (relabeled.unionByName(extra_lab),
            {"contracted_edges": int(n_contracted)})


def percolation_profile(
    spark: SparkSession,
    edges: DataFrame,
    ps: tuple[int, ...] = (30, 60, 90),
) -> DataFrame:
    """Random-FAILURE percolation curve: keep each undirected edge
    with probability p (deterministic LCG gate on the canonical
    pair — the DOULION coin, replayable in SQL), run connected
    components on the survivors, report per p: [p_pct, n_edges,
    n_vertices, n_components, largest] (vertices = endpoints of
    surviving edges).

    The complement of a_hub_robustness's targeted-attack probe — the
    Albert-Barabási asymmetry: scale-free graphs shrug off random
    failure (the curve stays near-connected down to small p) but
    shatter under hub attack. Each p level is one filtered scan +
    one CC run; levels are independent jobs.
    """
    from adopt_spark.algos.triangles import DOULION_A, DOULION_B, DOULION_M

    for p in ps:                      # validate ALL levels up front —
        if not 0 < p <= 100:          # no partial work before a raise
            raise ValueError(f"p_pct must be in (0, 100], got {p}")
    und = (edges.select(F.least("sid", "tid").alias("a"),
                        F.greatest("sid", "tid").alias("b"))
           .where(F.col("a") != F.col("b")).distinct())
    rows = []
    for p in ps:
        gate = ((F.col("a") * DOULION_A + F.col("b") * DOULION_B)
                % DOULION_M) % 100 < p
        samp = und.where(gate).select(F.col("a").alias("sid"),
                                      F.col("b").alias("tid"))
        labels, _ = connected_components(spark, samp)
        stats = (labels.groupBy("component")
                 .agg(F.count(F.lit(1)).alias("n"))
                 .agg(F.count(F.lit(1)).alias("n_components"),
                      F.coalesce(F.max("n"), F.lit(0)).alias("largest")))
        counts = samp.agg(
            F.count(F.lit(1)).alias("n_edges")).crossJoin(
            labels.agg(F.count(F.lit(1)).alias("n_vertices")))
        rows.append(counts.crossJoin(stats).select(
            F.lit(p).cast("long").alias("p_pct"),
            F.col("n_edges").cast("long"),
            F.col("n_vertices").cast("long"),
            F.col("n_components").cast("long"),
            F.col("largest").cast("long")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
