"""Generic vertex-centric (Pregel) superstep API over DataFrames.

The iterative graph algorithms in this package (pagerank, cc, lpa,
sssp, ...) share one physical shape: per superstep, JOIN vertex state
onto the edge set, AGGREGATE messages by destination, MERGE into new
state, checkpoint, repeat. This module exposes that shape as a
user-facing API — the declarative equivalent of Pregel's
compute()/sendMessage()/vote-to-halt — so a user can express a NEW
iterative algorithm without writing the superstep loop, lineage
truncation, resume logic, or fixpoint detection again.

Everything is plain Column expressions over a namespaced triplet
frame, so each superstep stays entirely inside Catalyst/codegen:

  * send expressions see the triplet columns: every edge attribute
    under its own name (``sid``, ``tid``, ``w``, ...), the source
    vertex state as ``src_<col>``, and (only if referenced — the dst
    join is skipped otherwise) the destination state as ``dst_<col>``.
    A NULL-valued message is NOT sent (GraphFrames semantics), which
    is how frontier algorithms prune quiescent vertices.
  * the merge expression is one aggregate over ``F.col(Pregel.MSG)``
    (e.g. ``F.min(Pregel.MSG)``) — executed as ONE partially
    aggregated (map-side combined) groupBy, so supernode in-boxes
    never funnel raw messages to a single reducer.
  * update expressions see the previous state columns plus the
    aggregated ``Pregel.MSG`` (NULL when a vertex got no messages).

Fixpoint halting uses the same O(1)-state fingerprint as
algos/cc.py (count + xxhash64 sum over the state columns); every
superstep snapshots through checkpoint.CheckpointManager, so runs
resume mid-algorithm and the iterative plan never accretes lineage.

Physical shape per superstep: 1-2 equi-joins (state onto edges) +
one map-side-combined aggregate + one outer merge join — identical
to the hand-written algorithms, which the tests hold it to
differentially (CC via hash-min, SSSP via frontier relaxation,
degree via a one-shot sum).

The reference engine has no user-extensible iteration surface (its
operators are fixed motif plans); this is new-engine API surface in
the north-rule idiom (supersteps + lineage + resume).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from adopt_spark.checkpoint import CheckpointManager


class Pregel:
    """Builder: configure vertex columns + messages, then ``run()``.

    >>> p = (Pregel(edges)                       # edges: sid, tid, ...
    ...      .with_vertex_column("label", F.col("v"),
    ...          F.least("label", F.coalesce(F.col(Pregel.MSG),
    ...                                      F.col("label"))))
    ...      .send_to_dst(F.col("src_label"))
    ...      .send_to_src(F.col("dst_label"))
    ...      .agg_msgs(F.min(Pregel.MSG)))
    >>> state, metrics = p.run(spark, max_iter=30)
    """

    MSG = "_msg"

    def __init__(self, edges: DataFrame,
                 vertices: DataFrame | None = None) -> None:
        if "sid" not in edges.columns or "tid" not in edges.columns:
            raise ValueError("edges must have sid and tid columns")
        self._edges = edges
        self._vertices = vertices
        self._vcols: list[tuple[str, Column, Column]] = []
        self._to_dst: list[Column] = []
        self._to_src: list[Column] = []
        self._agg: Column | None = None
        self._gaggs: list[tuple[str, Column]] = []

    # -- builder ------------------------------------------------------
    def with_vertex_column(self, name: str, init: Column,
                           update: Column) -> "Pregel":
        """``init`` runs once over the vertex frame; ``update`` runs
        each superstep over the old state + aggregated ``MSG``."""
        self._vcols.append((name, init, update))
        return self

    def send_to_dst(self, expr: Column) -> "Pregel":
        self._to_dst.append(expr)
        return self

    def send_to_src(self, expr: Column) -> "Pregel":
        self._to_src.append(expr)
        return self

    def agg_msgs(self, expr: Column) -> "Pregel":
        self._agg = expr
        return self

    def global_agg(self, name: str, expr: Column) -> "Pregel":
        """Register a global aggregate over the STATE frame, computed
        on the initial state and after every superstep. Values land in
        each metrics record under ``globals`` and are passed to
        callable update expressions and to ``stop_when``. This is
        Pregel's aggregator facility — what dangling-mass folding and
        L1-convergence tests need (see pregel_pagerank_full)."""
        self._gaggs.append((name, expr))
        return self

    # -- execution ----------------------------------------------------
    def _needs_dst_state(self) -> bool:
        return any("dst_" in str(e) for e in self._to_dst + self._to_src)

    def _vertex_frame(self) -> DataFrame:
        if self._vertices is not None:
            return self._vertices
        e = self._edges
        return (e.select(F.col("sid").alias("v"))
                .unionAll(e.select(F.col("tid").alias("v"))).distinct())

    def run(self, spark: SparkSession, max_iter: int = 20,
            checkpoint_dir: str | None = None, resume: bool = False,
            halt_on_fixpoint: bool = True,
            num_partitions: int | None = None,
            stop_when=None) -> tuple[DataFrame, list[dict]]:
        """Returns (state DataFrame[v, <vertex columns>], metrics).

        ``stop_when``: optional ``dict -> bool`` over the global-
        aggregate values of the just-finished superstep; True halts
        (Pregel's vote-to-halt for numeric programs, where the exact
        fingerprint never converges)."""
        if not self._vcols:
            raise ValueError("at least one with_vertex_column required")
        if not (self._to_dst or self._to_src):
            raise ValueError("at least one send_to_dst/send_to_src required")
        if self._agg is None:
            raise ValueError("agg_msgs is required")
        parts = num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions"))
        names = [n for n, _, _ in self._vcols]

        edges = self._edges.repartition(parts, "sid")
        edges = edges.persist()
        edges.count()

        verts = self._vertex_frame()
        state = verts.select(
            F.col(verts.columns[0]).alias("v"),
            *[init.alias(n) for n, init, _ in self._vcols])

        cm = CheckpointManager(checkpoint_dir
                               or tempfile.mkdtemp(prefix="pregel_ckpt_"))
        start_iter = 0
        if resume and cm.latest() is not None:
            start_iter = cm.latest() + 1
            state = cm.load(spark, cm.latest())

        join_dst = self._needs_dst_state()
        metrics: list[dict] = []
        g = self._globals(state)
        prev_fp = self._fingerprint(state, names) if halt_on_fixpoint \
            else None
        for it in range(start_iter, max_iter):
            t0 = time.time()
            src = state.select(F.col("v").alias("_sv"),
                               *[F.col(n).alias(f"src_{n}") for n in names])
            trip = edges.join(src, edges["sid"] == src["_sv"]).drop("_sv")
            if join_dst:
                dst = state.select(
                    F.col("v").alias("_dv"),
                    *[F.col(n).alias(f"dst_{n}") for n in names])
                trip = trip.join(dst, trip["tid"] == dst["_dv"]).drop("_dv")

            msg_frames = [
                trip.select(F.col("tid").alias("v"),
                            e.alias(self.MSG)) for e in self._to_dst
            ] + [
                trip.select(F.col("sid").alias("v"),
                            e.alias(self.MSG)) for e in self._to_src
            ]
            raw = msg_frames[0]
            for m in msg_frames[1:]:
                raw = raw.unionAll(m)
            inbox = (raw.where(F.col(self.MSG).isNotNull())
                     .groupBy("v").agg(self._agg.alias(self.MSG)))

            new_state = (state.join(inbox, "v", "left")
                         .select("v", *[
                             (upd(g) if callable(upd) else upd).alias(n)
                             for n, _, upd in self._vcols])
                         .repartition(parts, "v"))
            state = cm.save(new_state, it)
            g = self._globals(state)
            rec = {"iteration": it,
                   "sec": round(time.time() - t0, 4)}
            if g:
                rec["globals"] = dict(g)
            if stop_when is not None and stop_when(g):
                metrics.append(rec)
                break
            if halt_on_fixpoint:
                fp = self._fingerprint(state, names)
                rec["changed"] = fp != prev_fp
                metrics.append(rec)
                if fp == prev_fp:
                    break
                prev_fp = fp
            else:
                metrics.append(rec)

        edges.unpersist()
        return state, metrics

    def _globals(self, state: DataFrame) -> dict:
        if not self._gaggs:
            return {}
        row = state.agg(*[expr.alias(n) for n, expr in self._gaggs]) \
                   .collect()[0]
        return {n: (float(row[n]) if row[n] is not None else 0.0)
                for n, _ in self._gaggs}

    @staticmethod
    def _fingerprint(state: DataFrame, names: list[str]) -> tuple[int, int]:
        h = F.sum(F.xxhash64("v", *names).cast("decimal(38,0)"))
        row = state.agg(F.count(F.lit(1)).alias("n"),
                        F.coalesce(h, F.lit(0)).alias("h")).collect()[0]
        return int(row["n"]), int(row["h"])


# -- reference algorithms expressed ON the API (also the test oracles
#    hold these to the hand-written implementations) -------------------

def pregel_cc(edges: DataFrame) -> Pregel:
    """Hash-min connected components as a Pregel program: every vertex
    repeatedly adopts the minimum label seen on any incident edge."""
    e = edges.select(F.col("sid").cast("long"),
                     F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    return (Pregel(e)
            .with_vertex_column(
                "label", F.col("v"),
                F.least("label", F.coalesce(F.col(Pregel.MSG),
                                            F.col("label"))))
            .send_to_dst(F.col("src_label"))
            .send_to_src(F.col("dst_label"))
            .agg_msgs(F.min(Pregel.MSG)))


def pregel_sssp(edges: DataFrame, source: int) -> Pregel:
    """Weighted single-source shortest paths: relax every edge whose
    source is settled; NULL dist = unreached (no message sent)."""
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"),
                     F.col("w").cast("long"))
    upd = F.when(F.col(Pregel.MSG).isNotNull()
                 & (F.col("dist").isNull()
                    | (F.col(Pregel.MSG) < F.col("dist"))),
                 F.col(Pregel.MSG)).otherwise(F.col("dist"))
    return (Pregel(e)
            .with_vertex_column(
                "dist",
                F.when(F.col("v") == F.lit(source),
                       F.lit(0).cast("long")).otherwise(F.lit(None)),
                upd)
            .send_to_dst(F.col("src_dist") + F.col("w"))
            .agg_msgs(F.min(Pregel.MSG)))


def pregel_degree(edges: DataFrame) -> Pregel:
    """Total degree in ONE superstep (each edge sends 1 both ways) —
    the smoke-test program; run with max_iter=1."""
    return (Pregel(edges.select("sid", "tid"))
            .with_vertex_column("deg", F.lit(0).cast("long"),
                                F.coalesce(F.col(Pregel.MSG),
                                           F.lit(0).cast("long")))
            .send_to_dst(F.lit(1).cast("long"))
            .send_to_src(F.lit(1).cast("long"))
            .agg_msgs(F.sum(Pregel.MSG)))


def pregel_pagerank(edges: DataFrame, n_vertices: int,
                    damping: float = 0.85) -> Pregel:
    """PageRank as a Pregel program, for graphs with NO dangling
    vertices (the API has no global-aggregate hook, so per-superstep
    dangling-mass folding — which algos/pagerank.py does — cannot be
    expressed here; a dangling vertex would leak its mass). Vertex
    state: (rank, outdeg); outdeg is seeded from the vertex frame and
    carried unchanged. Run with ``halt_on_fixpoint=False`` and a
    fixed ``max_iter`` (float state never fingerprints equal).
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
    verts = (e.groupBy(F.col("sid").alias("v"))
             .agg(F.count(F.lit(1)).alias("outdeg"))
             .join(e.select(F.col("tid").alias("v")).distinct(),
                   "v", "full")
             .select("v", F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    base = (1.0 - damping) / n_vertices
    return (Pregel(e, vertices=verts)
            .with_vertex_column("rank",
                                F.lit(1.0 / n_vertices),
                                F.lit(base) + F.lit(damping)
                                * F.coalesce(F.col(Pregel.MSG), F.lit(0.0)))
            .with_vertex_column("outdeg", F.col("outdeg"),
                                F.col("outdeg"))
            .send_to_dst(F.col("src_rank") / F.col("src_outdeg"))
            .agg_msgs(F.sum(Pregel.MSG)))


def pregel_pagerank_full(edges: DataFrame, damping: float = 0.85,
                         tol: float = 1e-6):
    """PRODUCTION-semantics PageRank as a Pregel program — dangling
    mass folded per superstep via a global aggregate, L1 convergence
    via ``stop_when`` — matching algos/pagerank.py term for term:
    rank'(v) = (1-d)·p + d·(contrib(v) + d_mass·p). Returns
    (program, runner) where runner(spark, **kw) executes with the L1
    stop predicate wired. The generality proof for the API: the same
    builder surface expresses both exact integer programs (CC, SSSP)
    and damped numeric fixpoints with global state.
    """
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .dropDuplicates(["sid", "tid"]))
    verts = (e.groupBy(F.col("sid").alias("v"))
             .agg(F.count(F.lit(1)).alias("outdeg"))
             .join(e.select(F.col("sid").alias("v")).unionAll(
                 e.select(F.col("tid").alias("v"))).distinct(),
                 "v", "full")
             .select("v", F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    n = verts.count()
    p = 1.0 / n

    def new_rank(g):
        return (F.lit((1.0 - damping) * p)
                + F.lit(damping)
                * (F.coalesce(F.col(Pregel.MSG), F.lit(0.0))
                   + F.lit(g["d_mass"] * p)))

    prog = (Pregel(e, vertices=verts)
            .with_vertex_column("rank", F.lit(p), new_rank)
            .with_vertex_column("outdeg", F.col("outdeg"),
                                F.col("outdeg"))
            .with_vertex_column(
                "adelta", F.lit(0.0),
                lambda g: F.abs(new_rank(g) - F.col("rank")))
            .send_to_dst(F.when(F.col("src_outdeg") > 0,
                                F.col("src_rank") / F.col("src_outdeg")))
            .agg_msgs(F.sum(Pregel.MSG))
            .global_agg("d_mass", F.sum(F.when(F.col("outdeg") == 0,
                                               F.col("rank"))
                                        .otherwise(F.lit(0.0))))
            .global_agg("l1", F.sum("adelta")))

    def runner(spark, **kw):
        kw.setdefault("halt_on_fixpoint", False)
        kw.setdefault("stop_when",
                      lambda g: 0.0 < g["l1"] <= tol)
        return prog.run(spark, **kw)

    return prog, runner
