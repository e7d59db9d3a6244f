"""Local graph sparsification (Satuluri-Parthasarathy-Ruan, SIGMOD'11).

Community-preserving edge filtering: global "keep the top X% most
similar edges" thresholds delete whole sparse communities before they
touch a dense one, so the local scheme ranks each vertex's incident
edges by endpoint-neighborhood Jaccard similarity and keeps the top
ceil(deg^e) PER VERTEX (e in (0,1), default 0.5). Every vertex retains
its strongest local ties; downstream community/clustering algorithms
run on a graph that is ~|V|^? smaller but keeps their output nearly
intact — the standard pre-pass before Louvain/LPA at web scale.

Reference scope note: the reference engine (jxiw/ADOPT) has no
sparsification surface — this is part of the beyond-reference
link-graph toolkit (SURVEY.md §2.3 "graph analytics the workload
needs"), built on the same oracle-checked edge_jaccard primitive.

Scale shape: per-edge Jaccard comes from the degree-oriented wedge
join (worst-case-optimal fan-out, algos/ktruss.edge_supports); the
per-vertex top-ceil(deg^e) is one window rank over the symmetrized
(v, nbr, jaccard) frame — partitioned by vertex, so hub partitions
are deg-sized, never graph-sized (a 10^8-degree hub is one task's
sort; beyond that, replace the window with the same two-pass
threshold trick spatial_knn uses). Union-of-keeps + dedup closes it.
Everything is Column expressions; exact integers except the one 6
dp-quantized similarity, so ranking ties break identically on any
engine via the (jaccard desc, nbr asc) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from adopt_spark.algos.vertex_metrics import _lt, edge_jaccard


def local_sparsify(edges: DataFrame, exponent: float = 0.5) -> DataFrame:
    """Keep each vertex's top ceil(deg^exponent) incident edges by
    endpoint Jaccard -> the sparsified lt-canonical edge list
    [sid, tid, jaccard (6 dp)].

    An edge survives if EITHER endpoint ranks it inside its local
    budget (the union rule from the paper — guarantees every
    non-isolated vertex keeps >= 1 edge, so sparsification never
    disconnects a vertex from its best neighbor).
    """
    if not 0 < exponent <= 1:
        raise ValueError(f"exponent must be in (0, 1], got {exponent}")
    ej = edge_jaccard(edges)          # (sid, tid, cn, jaccard) on lt edges
    # Both orientations: each endpoint ranks the edge independently.
    per_v = (ej.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"),
                       "jaccard")
             .unionByName(
                 ej.select(F.col("tid").alias("v"),
                           F.col("sid").alias("nbr"), "jaccard")))
    w = Window.partitionBy("v").orderBy(F.desc("jaccard"), F.asc("nbr"))
    deg = per_v.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    # sqrt for the canonical e=0.5: IEEE sqrt is correctly rounded on
    # every engine, libm pow(x, 0.5) is not guaranteed to be — the
    # ceil() boundary at perfect squares must not flip cross-engine.
    d = F.col("deg").cast("double")
    budget = F.ceil(F.sqrt(d) if exponent == 0.5
                    else F.pow(d, F.lit(exponent)))
    ranked = (per_v.withColumn("rnk", F.row_number().over(w))
              .join(deg, "v")
              .where(F.col("rnk") <= budget))
    kept = ranked.select(
        F.least("v", "nbr").alias("sid"),
        F.greatest("v", "nbr").alias("tid")).dropDuplicates(["sid", "tid"])
    return (kept.join(ej, ["sid", "tid"])
            .select(F.col("sid").cast("long"), F.col("tid").cast("long"),
                    "jaccard"))


def sparsify_report(edges: DataFrame, exponent: float = 0.5) -> DataFrame:
    """One-row summary beside the kept-edge list: [n_edges, n_kept,
    kept_frac (6 dp)] — the sparsification ratio the e parameter is
    tuned against."""
    lt = _lt(edges)
    kept = local_sparsify(edges, exponent)
    n_all = lt.agg(F.count(F.lit(1)).alias("n_edges"))
    n_kept = kept.agg(F.count(F.lit(1)).alias("n_kept"))
    return (n_all.crossJoin(n_kept)
            .select(F.col("n_edges").cast("long"),
                    F.col("n_kept").cast("long"),
                    F.round(F.col("n_kept") / F.col("n_edges"), 6)
                    .alias("kept_frac")))
