"""Per-vertex structural metrics: triangle participation, local
clustering coefficients, and common-neighbor link prediction.

The reference counts motifs globally (graph_query/3_clique.sql
returns one scalar); these operators distribute the SAME triangle
enumeration per vertex — north-rule link-graph surface (hub
community structure, dependency-graph link suggestion).

Scale design:
  * triangle enumeration reuses the degree orientation
    (edges.orient_by_degree): every oriented out-list is O(sqrt(E)),
    so the wedge join's fan-out is worst-case optimal — identical
    plan shape to algos/triangles.triangle_count_join, but the
    matched (a, b, c) rows are exploded to their three corners and
    count-aggregated instead of count(*)-collapsed. Two shuffles
    beyond the orientation (wedge join, per-vertex aggregate), both
    with map-side partial aggregation.
  * common-neighbor wedges go through the shared middle vertex w;
    a degree-D hub contributes D^2 candidate pairs, so
    ``max_wedge_degree`` optionally drops super-hubs from the middle
    role (the standard Adamic-Adar practice — a 10^6-degree hub
    carries ~0 information and 10^12 pairs). The candidate join is a
    bounded-key equi-join on w, never an all-pairs product.

Triangle identity: id-ordered triples a < b < c over the reference's
``sid < tid`` edge convention — exactly the 3-clique oracle's rows,
so per-vertex counts sum to 3 x the global count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from adopt_spark.edges import orient_by_degree


def _lt(edges: DataFrame) -> DataFrame:
    return (edges.where(F.col("sid") < F.col("tid"))
            .dropDuplicates(["sid", "tid"]))


def _sym(lt: DataFrame) -> DataFrame:
    return lt.select(F.col("sid").alias("v"), F.col("tid").alias("nbr")) \
             .unionAll(lt.select(F.col("tid").alias("v"),
                                 F.col("sid").alias("nbr")))


def vertex_triangle_counts(edges: DataFrame) -> DataFrame:
    """DataFrame[v, tri]: triangles through each vertex (tri > 0 rows).

    Degree-oriented wedge join + closing join enumerate each triangle
    once; the three corners are exploded and aggregated.
    """
    o = orient_by_degree(_lt(edges))
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = (e1.join(e2, "a").where(F.col("b") != F.col("c"))
            .join(e3, ["b", "c"]))
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("v"))
    return corners.groupBy("v").agg(F.count(F.lit(1)).alias("tri"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """DataFrame[v, deg, tri, coeff] for every vertex with deg >= 2.

    coeff = 2*tri / (deg*(deg-1)) over the lt-canonical undirected
    graph, rounded to 6 dp (both engines compute the same rational).
    """
    lt = _lt(edges)
    deg = _sym(lt).groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    tri = vertex_triangle_counts(lt)
    return (
        deg.where(F.col("deg") >= 2)
        .join(tri, "v", "left")
        .select(
            "v", "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            F.round(F.lit(2.0) * F.coalesce(F.col("tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1))), 6)
             .alias("coeff"),
        )
    )


def common_neighbor_scores(
    edges: DataFrame,
    min_common: int = 2,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """Link prediction over non-adjacent pairs: DataFrame[u, v, cn, aa].

    cn = |N(u) ∩ N(v)|, aa = Adamic-Adar sum over the common
    neighbors w of 1/ln(deg(w)) (deg(w) >= 2 by construction, so the
    log never vanishes), for u < v NOT already an edge, keeping pairs
    with cn >= ``min_common``.
    """
    lt = _lt(edges)
    sym = _sym(lt)
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    mid = sym.select(F.col("nbr").alias("w"), F.col("v").alias("u"))
    if max_wedge_degree is not None:
        small = deg.where(F.col("deg") <= max_wedge_degree) \
                   .select(F.col("v").alias("w"))
        mid = mid.join(small, "w")
    cand = (
        mid.join(mid.select(F.col("w"), F.col("u").alias("v2")), "w")
        .where(F.col("u") < F.col("v2"))
        .select("u", F.col("v2").alias("v"), "w")
    )
    non_edges = cand.join(
        lt.select(F.col("sid").alias("u"), F.col("tid").alias("v")),
        ["u", "v"], "left_anti")
    scored = (
        non_edges.join(deg.select(F.col("v").alias("w"),
                                  F.col("deg").alias("wdeg")), "w")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"),
             F.round(F.sum(F.lit(1.0) / F.log(F.col("wdeg"))), 6).alias("aa"))
    )
    return scored.where(F.col("cn") >= min_common)


def degree_stats(edges: DataFrame) -> DataFrame:
    """One-row directed-graph summary: |V|, |E|, avg/max out- and
    in-degree, and the degree assortativity — the Pearson correlation
    between src out-degree and dst in-degree over the edge list (the
    directed analogue of Newman's r; hub-to-hub-heavy graphs score
    positive, hub-to-leaf negative).

    Scale shape: two degree aggregations (map-side partial agg), two
    bounded equi-joins back onto the edge list for the per-edge
    (outdeg, indeg) pairs, then single-row aggregates cross-joined —
    nothing driver-side. Averages are over vertices that HAVE the
    respective degree (out-rows / in-rows), matching the SQL oracle.
    """
    e = edges.select(F.col("sid").cast("long").alias("sid"),
                     F.col("tid").cast("long").alias("tid")) \
             .dropDuplicates(["sid", "tid"])
    outd = e.groupBy("sid").agg(F.count(F.lit(1)).alias("outdeg"))
    ind = e.groupBy("tid").agg(F.count(F.lit(1)).alias("indeg"))
    per_edge = e.join(outd, "sid").join(ind, "tid")
    nv = (e.select(F.col("sid").alias("v"))
          .union(e.select(F.col("tid").alias("v")))
          .distinct()
          .agg(F.count(F.lit(1)).alias("n_vertices")))
    base = e.agg(F.count(F.lit(1)).alias("n_edges"))
    od = outd.agg(F.round(F.avg("outdeg"), 6).alias("avg_outdeg"),
                  F.max("outdeg").alias("max_outdeg"))
    idg = ind.agg(F.round(F.avg("indeg"), 6).alias("avg_indeg"),
                  F.max("indeg").alias("max_indeg"))
    assort = per_edge.agg(
        F.round(F.corr(F.col("outdeg").cast("double"),
                       F.col("indeg").cast("double")), 6)
         .alias("assortativity"))
    return (nv.crossJoin(base).crossJoin(od).crossJoin(idg)
            .crossJoin(assort))


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row directed-graph reciprocity: of the distinct non-loop
    edges, how many have their reverse edge present ->
    (n_edges, n_reciprocal, reciprocity) with the ratio at 6 dp.

    Scale shape: one dedup aggregation + one self-equi-join on the
    reversed key (both sides identically hash-partitioned on the join
    key, so AQE plans a single shuffle each) + single-row aggregates.
    Nothing driver-side. A standard link-graph health metric (mutual
    dependency links in a repo-dependency graph).
    """
    e = (edges.select(F.col("sid").cast("long").alias("sid"),
                      F.col("tid").cast("long").alias("tid"))
         .where(F.col("sid") != F.col("tid"))
         .dropDuplicates(["sid", "tid"]))
    rev = e.select(F.col("tid").alias("sid"), F.col("sid").alias("tid"))
    recip = e.join(rev, ["sid", "tid"]).agg(
        F.count(F.lit(1)).alias("n_reciprocal"))
    total = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return total.crossJoin(recip).select(
        "n_edges", "n_reciprocal",
        F.round(F.when(F.col("n_edges") > 0,
                       F.col("n_reciprocal")
                       / F.col("n_edges").cast("double"))
                .otherwise(0.0), 6).alias("reciprocity"))


def directed_triad_counts(edges: DataFrame) -> DataFrame:
    """One-row directed triad census over the simple digraph ->
    (n_cyclic, n_transitive):

      * cyclic      — vertex triples carrying a directed 3-cycle
                      a->b->c->a, each cycle orbit counted once
                      (anchored at its minimum vertex; the reversed
                      cycle is a different edge set and counts
                      separately iff present);
      * transitive  — ordered triples with a->b, b->c AND the shortcut
                      a->c (the feed-forward / "trust" triad).

    Scale shape: the edge list deduped once, then two self-equi-joins
    per pattern (join keys are single vertices, so AQE's skew split
    covers hub fan-out) and a count-only aggregate — the same
    bounded-intermediate shape as the motif SQL suite; no orientation
    trick applies because the patterns are direction-sensitive.
    """
    e = (edges.select(F.col("sid").cast("long").alias("sid"),
                      F.col("tid").cast("long").alias("tid"))
         .where(F.col("sid") != F.col("tid"))
         .dropDuplicates(["sid", "tid"]))
    ab = e.select(F.col("sid").alias("a"), F.col("tid").alias("b"))
    bc = e.select(F.col("sid").alias("b"), F.col("tid").alias("c"))
    ca = e.select(F.col("sid").alias("c"), F.col("tid").alias("a"))
    ac = e.select(F.col("sid").alias("a"), F.col("tid").alias("c"))
    cyc = (ab.join(bc, "b").join(ca, ["c", "a"])
           .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
           .agg(F.count(F.lit(1)).alias("n_cyclic")))
    tra = (ab.join(bc, "b").join(ac, ["a", "c"])
           .agg(F.count(F.lit(1)).alias("n_transitive")))
    return cyc.crossJoin(tra)


def edge_jaccard(edges: DataFrame) -> DataFrame:
    """Per-edge neighborhood Jaccard similarity (the SCAN structural
    similarity) -> (sid, tid, cn, jaccard 6dp) for every lt-canonical
    edge: cn = |N(u) ∩ N(v)| (= the edge's triangle support),
    jaccard = cn / (deg(u) + deg(v) - cn) over the undirected graph.

    The edge-strength primitive for structural graph clustering and
    weak-tie pruning. Scale shape: support comes from the
    degree-oriented wedge + closing join (worst-case-optimal fan-out,
    see ktruss.edge_supports); degrees are one hash agg; two
    edge-keyed joins attach them. All counts exact; the one division
    is quantized at 6 dp on both engines.
    """
    from adopt_spark.algos.ktruss import edge_supports

    lt = _lt(edges)
    sup = edge_supports(lt)
    deg = _sym(lt).groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    out = (lt.join(sup, ["sid", "tid"], "left")
           .join(deg.select(F.col("v").alias("sid"),
                            F.col("deg").alias("deg_s")), "sid")
           .join(deg.select(F.col("v").alias("tid"),
                            F.col("deg").alias("deg_t")), "tid"))
    cn = F.coalesce(F.col("support"), F.lit(0))
    return out.select(
        "sid", "tid", cn.cast("long").alias("cn"),
        F.round(cn.cast("double")
                / (F.col("deg_s") + F.col("deg_t") - cn), 6)
         .alias("jaccard"))


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Per-vertex average neighbor degree over the symmetrized graph
    -> [v, deg, avg_nbr_deg (6 dp)] — the knn(v) statistic behind
    degree-correlation analysis (Pastor-Satorras et al.): plotted
    against deg it shows whether hubs attach to hubs or to leaves.

    Scale shape: one symmetrize + dedup, one degree hash-agg, one
    equi-join of the degree table back onto the adjacency (bounded
    key join), one per-vertex average — map-side partial agg on
    every shuffle.
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("nbr")))
           .dropDuplicates(["v", "nbr"]))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    nbr_deg = sym.join(deg.select(F.col("v").alias("nbr"),
                                  F.col("deg").alias("nd")), "nbr")
    return (nbr_deg.groupBy("v")
            .agg(F.round(F.avg(F.col("nd").cast("double")), 6)
                 .alias("avg_nbr_deg"))
            .join(deg, "v")
            .select("v", "deg", "avg_nbr_deg"))


def rich_club(edges: DataFrame,
              thresholds: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
              ) -> DataFrame:
    """Rich-club coefficient phi(k) at fixed degree thresholds ->
    [k, n_rich, e_rich, phi (6 dp)]: among vertices of (symmetrized)
    degree > k, the realized fraction of possible undirected edges
    (Zhou & Mondragon). phi(k) -> 1 at high k means the hubs form a
    near-clique — the classic web/citation-graph signature.

    Scale shape: degree agg, then PER THRESHOLD one semi-join-filtered
    edge count — the thresholds list is a tiny literal cross join, so
    the plan is |thresholds| filtered aggregates over one shared
    degree-joined edge list, never an all-pairs product.
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    und = (e.select(F.least("sid", "tid").alias("a"),
                    F.greatest("sid", "tid").alias("b"))
           .distinct())
    sym = (und.select(F.col("a").alias("v"))
           .unionAll(und.select(F.col("b").alias("v"))))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    ks = edges.sparkSession.createDataFrame(
        [(int(k),) for k in thresholds], "k long")
    rich = ks.join(deg, F.col("deg") > F.col("k")).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rich"))
    ed = (und.join(deg.select(F.col("v").alias("a"),
                              F.col("deg").alias("da")), "a")
          .join(deg.select(F.col("v").alias("b"),
                           F.col("deg").alias("db")), "b"))
    erich = ks.join(ed, (F.col("da") > F.col("k"))
                    & (F.col("db") > F.col("k"))) \
              .groupBy("k").agg(F.count(F.lit(1)).alias("e_rich"))
    return (ks.join(rich, "k", "left").join(erich, "k", "left")
            .select("k",
                    F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
                    F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
                    F.when(F.coalesce("n_rich", F.lit(0)) >= 2,
                           F.round(F.coalesce("e_rich", F.lit(0))
                                   * 2.0 / (F.col("n_rich")
                                            * (F.col("n_rich") - 1)), 6))
                     .alias("phi")))


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    symmetrized graph -> one row [n_vertices, n_edges, assortativity]:
    the Pearson correlation between the degrees at the two ends of an
    edge. r > 0 = hubs attach to hubs (social networks), r < 0 = hubs
    attach to leaves (the web / dependency graphs).

    Numeric determinism: computed from INTEGER moment sums
    (sum d, sum d^2, sum du*dv over symmetric edge occurrences) with
    one final double division — bit-identical across engines and
    partitionings, unlike a streaming corr() whose accumulation order
    varies. Degrees are bounded by |V| so the bigint sums stay well
    inside 2^63 at any realistic scale (guard: 100-TB graphs with
    >3e9 edge occurrences of 1e6-degree hubs would move to decimal).

    Scale shape: symmetrize + dedup, one degree agg, two bounded-key
    equi-joins of the degree table onto the edge list, one global
    moment aggregate (map-side partial). Nothing driver-side.
    """
    e = edges.select(F.col("sid").cast("long"), F.col("tid").cast("long")) \
             .where(F.col("sid") != F.col("tid"))
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("nbr")))
           .dropDuplicates(["v", "nbr"]))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (sym
             .join(deg.select(F.col("v"), F.col("deg").alias("du")), "v")
             .join(deg.select(F.col("v").alias("nbr"),
                              F.col("deg").alias("dv")), "nbr"))
    m = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("du").cast("long").alias("sx"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("sxx"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("sxy"),
    )
    return m.crossJoin(
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    ).select(
        "n_vertices",
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx"))
            / (F.col("m") * F.col("sxx")
               - F.col("sx") * F.col("sx")).cast("double"),
            6).alias("assortativity"),
    )


def orbit_counts_3(edges: DataFrame) -> DataFrame:
    """Per-vertex 3-node graphlet orbit counts (Przulj GDV, orbits
    0-3): DataFrame[v, o0, o1, o2, o3] where o0 = degree, o1 = wedges
    with v as an END (path u-w-v centered elsewhere), o2 = wedges
    with v as the CENTER, o3 = triangles through v. The 3-node
    graphlet-degree-vector features graph-ML pipelines attach to
    vertices.

    All counts derive from two aggregates already in the engine's
    toolbox — degrees and per-vertex triangles — plus one
    neighbor-degree join; the closed forms
    o1 = Σ_{u∈N(v)}(deg(u)-1) - 2·o3 and o2 = C(deg,2) - o3 avoid
    enumerating wedges entirely. All-integer, exact.
    """
    lt = _lt(edges)
    sym = _sym(lt)
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    tri = vertex_triangle_counts(lt)
    nbr_deg = (sym.join(deg.select(F.col("v").alias("nbr"),
                                   F.col("deg").alias("nd")), "nbr")
               .groupBy("v").agg(F.sum("nd").alias("nds")))
    return (deg.join(nbr_deg, "v", "left").join(tri, "v", "left")
            .select(
                "v",
                F.col("deg").cast("long").alias("o0"),
                (F.coalesce("nds", F.lit(0)) - F.col("deg")
                 - 2 * F.coalesce("tri", F.lit(0))).cast("long")
                .alias("o1"),
                (F.col("deg") * (F.col("deg") - 1) / 2
                 - F.coalesce("tri", F.lit(0))).cast("long").alias("o2"),
                F.coalesce("tri", F.lit(0)).cast("long").alias("o3")))


def link_prediction_auc(edges: DataFrame, holdout_mod: int = 10,
                        k_neg: int = 3, m_neg: int = 8) -> DataFrame:
    """Link-prediction EVALUATION: hold out ~1/holdout_mod of the
    edges by a deterministic hash, score held-out positives and
    hash-sampled negatives by common-neighbor count over the TRAIN
    graph, and report the EXACT AUC — P(score_pos > score_neg) +
    ½·P(tie) computed from the two score histograms (never the
    pos×neg pair materialization). One row:
    (n_pos, n_neg, auc, mean_cn_pos, mean_cn_neg), 6 dp doubles over
    exact integer counts.

    Every stage is deterministic and engine-replayable: the split is
    (sid·1000003 + tid) % holdout_mod == 0, negatives come from
    functions.sampling.negative_samples on the train graph
    (canonicalized, with positives anti-joined out), scores are
    bounded-key wedge joins.
    """
    from adopt_spark.functions.sampling import negative_samples

    lt = _lt(edges)
    h = (F.col("sid") * 1_000_003 + F.col("tid")) % holdout_mod
    test = lt.where(h == 0)
    train = lt.where(h != 0)
    sym = _sym(train)

    def cn_scores(pairs: DataFrame) -> DataFrame:
        """pairs(u, v) -> (u, v, cn) with cn = common TRAIN
        neighbors; zero-cn pairs kept."""
        a = sym.select(F.col("v").alias("u"), F.col("nbr").alias("w1"))
        b = sym.select(F.col("v").alias("vv"), F.col("nbr").alias("w2"))
        hits = (pairs.join(a, "u")
                .join(b, (F.col("v") == F.col("vv"))
                      & (F.col("w1") == F.col("w2")))
                .groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn")))
        return (pairs.join(hits, ["u", "v"], "left")
                .select("u", "v",
                        F.coalesce("cn", F.lit(0)).cast("long")
                        .alias("cn")))

    pos = test.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
    neg_raw = negative_samples(train, k=k_neg, m=m_neg)
    neg = (neg_raw.select(F.least("src", "dst").alias("u"),
                          F.greatest("src", "dst").alias("v"))
           .distinct()
           .join(lt.select(F.col("sid").alias("u"),
                           F.col("tid").alias("v")),
                 ["u", "v"], "left_anti"))
    ph = cn_scores(pos).groupBy("cn").agg(
        F.count(F.lit(1)).alias("pc"))
    nh = cn_scores(neg).groupBy("cn").agg(
        F.count(F.lit(1)).alias("nc"))
    wins = (ph.crossJoin(nh.select(F.col("cn").alias("ncn"), "nc"))
            .select(
                F.sum(F.when(F.col("cn") > F.col("ncn"),
                             F.col("pc") * F.col("nc")).otherwise(0))
                .alias("w"),
                F.sum(F.when(F.col("cn") == F.col("ncn"),
                             F.col("pc") * F.col("nc")).otherwise(0))
                .alias("t")))
    stats = (ph.agg(F.sum("pc").alias("np"),
                    F.sum(F.col("cn") * F.col("pc")).alias("sp"))
             .crossJoin(nh.agg(F.sum("nc").alias("nn"),
                               F.sum(F.col("cn") * F.col("nc"))
                               .alias("sn"))))
    return (stats.crossJoin(wins)
            .select(
                F.col("np").cast("long").alias("n_pos"),
                F.col("nn").cast("long").alias("n_neg"),
                F.round((F.col("w") + 0.5 * F.col("t"))
                        / (F.col("np") * F.col("nn")), 6).alias("auc"),
                F.round(F.col("sp") / F.col("np"), 6)
                .alias("mean_cn_pos"),
                F.round(F.col("sn") / F.col("nn"), 6)
                .alias("mean_cn_neg")))


def structural_equiv(edges: DataFrame, min_size: int = 2) -> DataFrame:
    """Structural-equivalence classes: groups of vertices with exactly
    identical (undirected) neighbor sets -> one row per class with
    >= ``min_size`` members: [class_rep (min member id), n_members,
    deg (the shared neighborhood size)].

    The mirror-detection primitive for link graphs: republished repos,
    vendored copies, and template-generated pages all surface as
    vertices whose out-link sets coincide exactly (Gibson et al.'s
    "shingling the web graph" solves the approximate version; the
    exact version is one aggregate). Two structurally equivalent
    vertices are interchangeable in ANY topology-only algorithm, so
    classes also feed graph compression (collapse the class to one
    representative + a multiplicity).

    Scale shape: one adjacency build (groupBy v, sort_array over the
    distinct neighbor set — the same shuffle every adjacency consumer
    pays), then ONE group-by on the adjacency array itself with
    map-side partial agg. The second shuffle carries each adjacency
    array once, i.e. O(E) bytes total — the same volume as the build.
    At 10^12-edge scale, pre-hash the array to a 64-bit key and
    group by (hash, size) first so the wide arrays only travel for
    the < 1e-9 of vertices whose hash bucket has >= 2 members, then
    verify exact-array equality within buckets; the contract runs the
    direct exact plan.

    Note adjacency equality is on the SYMMETRIZED graph, so a class's
    members are never adjacent to each other (v in N(u) would need
    u in N(u)) — equivalence here is the "false twins" relation of
    modular decomposition.
    """
    lt = _lt(edges)
    adj = (_sym(lt).groupBy("v")
           .agg(F.sort_array(F.collect_set("nbr")).alias("adj")))
    return (adj.groupBy("adj")
            .agg(F.min("v").alias("class_rep"),
                 F.count(F.lit(1)).alias("n_members"))
            .where(F.col("n_members") >= min_size)
            .select(F.col("class_rep").cast("long"),
                    F.col("n_members").cast("long"),
                    F.size("adj").cast("long").alias("deg")))


def quotient_graph(edges: DataFrame) -> DataFrame:
    """Structural-equivalence quotient (graph compression report):
    collapse every false-twin class (identical undirected neighbor
    sets — see structural_equiv) to its min-id representative and
    count the quotient graph -> one row [n_vertices, n_classes,
    n_edges, n_quotient_edges, vertex_ratio, edge_ratio] (ratios at
    6 dp).

    The compression a web/dependency graph admits from mirrors and
    template-generated pages: any topology-only algorithm can run on
    the quotient with per-class multiplicities and be projected back
    exactly. Twins are never adjacent, so the quotient has no
    self-loops and mapped edges stay well-defined.

    Scale shape: the adjacency group-by of structural_equiv, one
    vertex->rep map join onto each edge endpoint (two bounded-key
    equi-joins), one distinct + two count aggregates.
    """
    lt = _lt(edges)
    adj = (_sym(lt).groupBy("v")
           .agg(F.sort_array(F.collect_set("nbr")).alias("adj")))
    from pyspark.sql import Window

    rep = (adj.withColumn(
        "rep", F.min("v").over(Window.partitionBy("adj")))
        .select("v", "rep"))
    mapped = (lt.join(rep.withColumnRenamed("v", "sid")
                      .withColumnRenamed("rep", "rs"), "sid")
              .join(rep.withColumnRenamed("v", "tid")
                    .withColumnRenamed("rep", "rt"), "tid")
              .select(F.least("rs", "rt").alias("qs"),
                      F.greatest("rs", "rt").alias("qt"))
              .dropDuplicates(["qs", "qt"]))
    counts = (adj.agg(F.count(F.lit(1)).alias("n_vertices"),
                      F.countDistinct("adj").alias("n_classes"))
              .crossJoin(lt.agg(F.count(F.lit(1)).alias("n_edges")))
              .crossJoin(mapped.agg(
                  F.count(F.lit(1)).alias("n_quotient_edges"))))
    return counts.select(
        F.col("n_vertices").cast("long"),
        F.col("n_classes").cast("long"),
        F.col("n_edges").cast("long"),
        F.col("n_quotient_edges").cast("long"),
        F.round(F.col("n_classes") / F.col("n_vertices"), 6)
        .alias("vertex_ratio"),
        F.round(F.col("n_quotient_edges") / F.col("n_edges"), 6)
        .alias("edge_ratio"))
