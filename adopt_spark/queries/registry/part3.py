# registry part 3/5 — continues part2 in the same namespace
from __future__ import annotations


# ------------------- shortest paths (round 3: BFS + weighted SSSP) --------

def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distances from the min-sid source over the UNDIRECTED
    sparse graph; oracle = unrolled Bellman-Ford (unit weights). Only
    reached vertices appear — absence, not NULL, encodes infinity."""
    from adopt_spark.algos.paths import shortest_paths

    e = derived_edges_sparse(spark, sf_dir)
    src = int(e.agg(F.min("sid")).collect()[0][0])
    dist, _ = shortest_paths(spark, e, src, weighted=False, directed=False)
    return dist.select("v", "dist")


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP (deterministic contract weights 1..10) from the
    min-sid source over the DIRECTED dense graph; exact BIGINT dists."""
    from adopt_spark.algos.paths import shortest_paths

    e = derived_edges(spark, sf_dir)
    src = int(e.agg(F.min("sid")).collect()[0][0])
    dist, _ = shortest_paths(spark, e, src, weighted=True, directed=True)
    return dist.select("v", "dist")


def q_sssp_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path TREE from the min-sid source: (v, dist,
    parent) with parent = the min-u relaxation witness (dist(u) + w ==
    dist(v)), NULL at the source — path reconstruction as one
    post-convergence join, no parent bookkeeping in the superstep
    loop (algos/paths.py:shortest_path_tree)."""
    from adopt_spark.algos.paths import shortest_path_tree

    e = derived_edges(spark, sf_dir)
    src = int(e.agg(F.min("sid")).collect()[0][0])
    tree, _ = shortest_path_tree(spark, e, src, weighted=True, directed=True)
    return tree.select("v", "dist", "parent")


ORACLES.update({
    "a_bfs_hops": _og.shortest_path_sql(
        SPARSE_EDGE_SQL, _og.BFS_ROUNDS, weighted=False, directed=False),
    "a_sssp_weighted": _og.shortest_path_sql(
        DERIVED_EDGE_SQL, _og.SSSP_ROUNDS, weighted=True, directed=True),
    "a_sssp_tree": _og.shortest_path_tree_sql(
        DERIVED_EDGE_SQL, _og.SSSP_ROUNDS, weighted=True, directed=True),
})


# ----------- per-vertex metrics / link prediction / SCC / KMV sketch ------

# Common-neighbor threshold: the sf0.01 dense graph tops out at cn=7
# (294 pairs >= 5, 2770 >= 4); 4 keeps the contract result substantial
# without ballooning the oracle.
LINKPRED_MIN_COMMON = 4

# SCC runs on the id-bounded dense subgraph so the DuckDB
# transitive-closure oracle stays O(subgraph^2); at sf0.01 this slice
# has a giant 297-vertex SCC plus singleton DAG vertices.
SCC_ID_LIM = 300


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-set betweenness (Brandes from the 4 lowest sources) on
    the directed dense graph; full per-vertex dependency sums vs the
    unrolled forward-sigma/backward-delta oracle."""
    from adopt_spark.algos.betweenness import betweenness_from_pivots
    from adopt_spark.queries.oracle_gen import BRANDES_PIVOTS

    e = derived_edges(spark, sf_dir)
    pivots = [int(r[0]) for r in e.select("sid").distinct()
              .orderBy("sid").limit(BRANDES_PIVOTS).collect()]
    out, _ = betweenness_from_pivots(spark, e, pivots)
    return out.select("v", F.round("bc", 6).alias("bc"))


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic walk corpus (one 8-step walk per vertex of the
    dense graph); the DuckDB twin replays every step via the shared
    integer mix over the same sorted adjacency."""
    from adopt_spark.algos.walks import random_walks

    return random_walks(spark, derived_edges(spark, sf_dir), length=8)


def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-hour distinct-user KMV estimates (bounded O(k)
    state per window via applyInPandasWithState); the mergeable-
    sketch identity makes the stream's final estimates equal batch
    KMV, so the batch DuckDB twin checks them value-for-value."""
    from adopt_spark.streaming.sketch_stream import windowed_distinct_kmv_stream

    return windowed_distinct_kmv_stream(spark, sf_dir, k=32)


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank (per-edge contract weights 1..10): full
    per-vertex vector at PR_ITERS supersteps vs the weighted unrolled
    recurrence (rank flows w/Σw per link instead of 1/outdeg)."""
    from adopt_spark.algos.paths import contract_weight
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir).withColumn(
        "w", contract_weight(F.col("sid"), F.col("tid")).cast("double"))
    ranks, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS, weight_col="w")
    return ranks.select("v", F.round("rank", 6).alias("rank"))


def q_pagerank_personal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (reset_vertices = the 3 smallest vertex
    ids): teleport and dangling redistribution follow the reset
    distribution, r0 = p. Full per-vertex vector at PR_ITERS fixed
    supersteps vs the personalized unrolled recurrence
    (oracle_gen.pagerank_fixed_sql(personalized=3))."""
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir)
    seeds = [
        int(r[0])
        for r in (e.select(F.col("sid").alias("v"))
                  .union(e.select(F.col("tid").alias("v")))
                  .distinct().orderBy("v").limit(3).collect())
    ]
    ranks, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS,
                        reset_vertices=seeds)
    return ranks.select("v", F.round("rank", 6).alias("rank"))


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities at HITS_ITERS fixed iterations, L1-
    normalized; full per-vertex (auth, hub) vector vs the unrolled
    oracle."""
    from adopt_spark.algos.hits import hits
    from adopt_spark.queries.oracle_gen import HITS_ITERS

    state, _ = hits(spark, derived_edges(spark, sf_dir),
                    max_iter=HITS_ITERS)
    return state.select("v", F.round("auth", 6).alias("auth"),
                        F.round("hub", 6).alias("hub"))


def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA (degree-normalized HITS — the who-to-follow ranking) at
    SALSA_ITERS fixed iterations, L1-normalized; full per-vertex
    (auth, hub) vector vs the unrolled oracle (algos/salsa.py)."""
    from adopt_spark.algos.salsa import salsa
    from adopt_spark.queries.oracle_gen import SALSA_ITERS

    state, _ = salsa(spark, derived_edges(spark, sf_dir),
                     max_iter=SALSA_ITERS)
    return state.select("v", F.round("auth", 6).alias("auth"),
                        F.round("hub", 6).alias("hub"))


def q_msbfs_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (min hop distance to a 5-vertex seed set)
    over the UNDIRECTED sparse graph — the distance-to-seed-set
    primitive; same unrolled oracle with a seeded d0."""
    from adopt_spark.algos.paths import shortest_paths

    e = derived_edges_sparse(spark, sf_dir)
    seeds = [int(r[0]) for r in
             e.select("sid").distinct().orderBy("sid").limit(5).collect()]
    dist, _ = shortest_paths(spark, e, seeds, weighted=False, directed=False)
    return dist.select("v", "dist")


def q_kmv_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct sketch (customers per order priority);
    grouped estimates oracle-checked bit-for-bit."""
    from adopt_spark.functions.sketch import kmv_distinct_by

    return kmv_distinct_by(_t(spark, sf_dir, "orders"),
                           "o_orderpriority", "o_custkey", k=256)


def q_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HyperLogLog distinct sketch (customers per order
    priority) with shared-hash registers; the estimate — including
    the linear-counting small-range branch — is value-checked against
    the DuckDB twin, alongside the exact count."""
    from adopt_spark.functions.sketch import hll_distinct_by

    return hll_distinct_by(_t(spark, sf_dir, "orders"),
                           "o_orderpriority", "o_custkey")


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of every deg>=2 vertex of the
    dense graph (per-vertex triangle participation / wedge count)."""
    from adopt_spark.algos.vertex_metrics import clustering_coefficients

    return clustering_coefficients(derived_edges(spark, sf_dir))


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor + Adamic-Adar scores for non-adjacent pairs
    with >= LINKPRED_MIN_COMMON shared neighbors."""
    from adopt_spark.algos.vertex_metrics import common_neighbor_scores

    return common_neighbor_scores(derived_edges(spark, sf_dir),
                                  min_common=LINKPRED_MIN_COMMON)


def q_scc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex SCC labels (min member id) of the bounded dense
    subgraph, via distributed forward-max coloring."""
    from adopt_spark.algos.scc import strongly_connected_components

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    labels, _ = strongly_connected_components(spark, e)
    return labels.select("v", "comp")


_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_PAT = r"https?://[^\s]+"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count + redact emails/URLs per document. The
    corpus is synthetic, so deterministic PII is INJECTED for
    doc_id < 20 (same concat in the oracle) — the regex machinery is
    what's under test. Patterns are kept inside the Java-regex ∩ RE2
    common dialect so both engines match identically."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.withColumn(
        "t",
        F.when(F.col("doc_id") < 20,
               F.concat(F.col("text"),
                        F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com see https://site"),
                        F.col("doc_id").cast("string"),
                        F.lit(".example.org/page now")))
         .otherwise(F.col("text")))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_PAT, "<EMAIL>"),
        _URL_PAT, "<URL>")
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_PAT), F.lit(0)))
         .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_URL_PAT), F.lit(0)))
         .cast("long").alias("n_urls"),
        F.length(redacted).cast("long").alias("len_redacted"))


def q_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's single most
    expensive order (per-row dependent top-1 — the classic lateral
    shape Catalyst rewrites into a ranked join)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lt")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lt")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lt c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders_lt o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        WHERE c.c_custkey < 200
    """)


def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): per-returnflag aggregates widened then melted
    to (l_returnflag, measure, val) long format."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"))
    return wide.unpivot(
        "l_returnflag", ["sum_qty", "sum_price", "avg_disc"],
        "measure", "val")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sample (Efraimidis-Spirakis
    hash-priority) of documents by length."""
    from adopt_spark.functions.sampling import weighted_sample_topk

    return weighted_sample_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", k=20)


def q_avg_nbr_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex average neighbor degree (degree-correlation knn)."""
    from adopt_spark.algos.vertex_metrics import avg_neighbor_degree

    return avg_neighbor_degree(derived_edges(spark, sf_dir))


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize retail price, maximize size
    (two-phase partition-local + global skyline kernel; oracle =
    NOT EXISTS dominance SQL)."""
    from adopt_spark.functions.skyline import skyline

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice")
    out = skyline(p, minimize=["p_retailprice"], maximize=["p_size"])
    return out.orderBy("p_partkey")


def q_wl_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round Weisfeiler-Leman refinement: per-vertex structural
    fingerprint colors; oracle = oracle_gen.wl_fixed_sql (same
    integer Horner fold via DuckDB list_reduce — bit-identical)."""
    from adopt_spark.algos.wl import wl_colors

    return wl_colors(derived_edges(spark, sf_dir))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel anchored at each user's first
    view, all steps within 7 days; oracle = the identical CTE chain
    (functions/funnel.py:funnel_oracle_sql)."""
    from adopt_spark.functions.funnel import funnel

    return funnel(_t(spark, sf_dir, "events"),
                  ["view", "click", "purchase"], within="7 DAYS")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ=1/30 heavy-hitter words via per-partition Misra-Gries
    candidates + exact broadcast-verify; output is exact, so the
    oracle is a plain GROUP BY / HAVING count filter."""
    from adopt_spark.functions.heavy import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "documents"), p=1, q=30)


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-round deterministic Lloyd's k-means (k=8) cluster assignment
    over the embeddings table; oracle = the unrolled iteration chain
    (functions/kmeans.py:kmeans_assign_sql)."""
    from adopt_spark.functions.kmeans import kmeans_assign

    return kmeans_assign(_t(spark, sf_dir, "embeddings"))


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of
    their first event; active-user counts per (cohort, week offset).
    Pure date-trunc + integer arithmetic — identical in DuckDB."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (ev.join(first, "user_id")
            .select("user_id",
                    F.date_format("cohort", "yyyy-MM-dd")
                    .alias("cohort_week"),
                    (F.datediff(F.to_date("wk"), F.to_date("cohort")) / 7)
                    .cast("int").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("active_users")))


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient from integer moment sums."""
    from adopt_spark.algos.vertex_metrics import assortativity

    return assortativity(derived_edges(spark, sf_dir))


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient at fixed degree thresholds."""
    from adopt_spark.algos.vertex_metrics import rich_club

    return rich_club(derived_edges(spark, sf_dir))


def q_pivot_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.pivot: event counts per market segment (rows) × event type
    (columns, fixed value list so the schema is deterministic)."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    types = ["click", "error", "purchase", "signup", "view"]
    joined = e.join(c, e.user_id == c.c_custkey)
    out = (joined.groupBy("c_mktsegment")
           .pivot("event_type", types)
           .agg(F.count(F.lit(1))))
    return out.select(
        "c_mktsegment",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types])


def q_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG: contract every SCC to one node, emit the
    distinct inter-component edges — the quotient graph web-scale
    link analysis runs on after the SCC pass (cycle-free by
    construction). Composition of the SCC kernel + one distinct
    projection; oracle = the recursive-CTE SCC labels joined back to
    the edge table."""
    from adopt_spark.algos.scc import strongly_connected_components

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    labels, _ = strongly_connected_components(spark, e)
    ls = labels.select(F.col("v").alias("sid"), F.col("comp").alias("ca"))
    lt = labels.select(F.col("v").alias("tid"), F.col("comp").alias("cb"))
    return (e.join(ls, "sid").join(lt, "tid")
            .where(F.col("ca") != F.col("cb"))
            .select("ca", "cb").distinct())


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MIS-peeling vertex coloring of the bounded dense
    subgraph (7 colors); oracle = oracle_gen.coloring_fixed_sql
    (unrolled color×round schedule)."""
    from adopt_spark.algos.mis import greedy_coloring

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    return greedy_coloring(e)


def q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated SimRank top-50 pairs on the bounded dense subgraph;
    oracle = oracle_gen.simrank_sql (unrolled join-aggregate DP)."""
    from adopt_spark.algos.simrank import simrank

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    s = simrank(spark, e)
    scored = (s.where(F.col("a") < F.col("b"))
              .select("a", "b", F.round("s", 6).alias("score")))
    w = Window.orderBy(F.desc("score"), "a", "b")
    return (scored.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= 50))


def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition (giant SCC / IN / OUT / other) of the
    bounded dense subgraph — the canonical web-graph structure
    analysis, composed from the SCC and frontier-BFS kernels."""
    from adopt_spark.algos.scc import bowtie_decomposition

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    return bowtie_decomposition(spark, e)


def q_truss_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge truss numbers of the dense graph (support peeling on
    the engine's WCOJ triangle plan); oracle = bounded-depth unrolled
    peel (oracle_gen.truss_numbers_sql)."""
    from adopt_spark.algos.ktruss import truss_numbers

    out, _ = truss_numbers(spark, derived_edges(spark, sf_dir))
    return out.select("sid", "tid", F.col("truss").cast("int").alias("truss"))


def q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates over events.user_id — the
    approximate counts (including any collision overestimates) are
    oracle-checked bit-for-bit via shared-hash replication."""
    from adopt_spark.functions.sketch import count_min_estimates

    return count_min_estimates(_t(spark, sf_dir, "events"), "user_id")


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k distinct sketch over orders.o_custkey —
    the approximate ESTIMATE itself is oracle-checked bit-for-bit."""
    from adopt_spark.functions.sketch import kmv_distinct

    return kmv_distinct(_t(spark, sf_dir, "orders"), "o_custkey", k=256)


_VM_PRELUDE = f"""WITH edge AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM lt UNION ALL SELECT tid, sid FROM lt
), deg AS MATERIALIZED (
    SELECT v, count(*) AS deg FROM sym GROUP BY v
)"""

ORACLES.update({
    "g_clustering_coeff": _VM_PRELUDE + """,
tris AS (
    SELECT e1.sid AS a, e1.tid AS b, e2.tid AS c
    FROM lt e1 JOIN lt e2 ON e2.sid = e1.sid AND e1.tid < e2.tid
    JOIN lt e3 ON e3.sid = e1.tid AND e3.tid = e2.tid
), vt AS (
    SELECT v, count(*) AS tri FROM (
        SELECT a AS v FROM tris UNION ALL
        SELECT b FROM tris UNION ALL
        SELECT c FROM tris) GROUP BY v
)
SELECT deg.v, deg.deg, CAST(coalesce(vt.tri, 0) AS BIGINT) AS tri,
       CAST(round(2.0 * coalesce(vt.tri, 0)
                  / (deg.deg * (deg.deg - 1)), 6) AS DOUBLE) AS coeff
FROM deg LEFT JOIN vt USING (v) WHERE deg.deg >= 2""",
    "g_link_prediction": _VM_PRELUDE + f""",
cand AS (
    SELECT m1.v AS u, m2.v AS v, m1.nbr AS w
    FROM sym m1 JOIN sym m2 ON m1.nbr = m2.nbr AND m1.v < m2.v
), ne AS (
    SELECT u, v, w FROM cand
    ANTI JOIN lt ON lt.sid = cand.u AND lt.tid = cand.v
)
SELECT ne.u, ne.v, count(*) AS cn,
       CAST(round(sum(1.0 / ln(deg.deg)), 6) AS DOUBLE) AS aa
FROM ne JOIN deg ON deg.v = ne.w
GROUP BY ne.u, ne.v
HAVING count(*) >= {LINKPRED_MIN_COMMON}""",
    "a_scc_components": f"""WITH RECURSIVE edge AS MATERIALIZED (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL})
    WHERE sid < {SCC_ID_LIM} AND tid < {SCC_ID_LIM}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), reach(s, t) AS (
    SELECT sid, tid FROM edge
    UNION
    SELECT r.s, e.tid FROM reach r JOIN edge e ON e.sid = r.t
), mutual AS (
    SELECT r1.s AS v, r1.t AS u
    FROM reach r1 JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s
)
SELECT verts.v,
       least(verts.v, coalesce(min(mutual.u), verts.v)) AS comp
FROM verts LEFT JOIN mutual ON mutual.v = verts.v
GROUP BY verts.v""",
    "a_condensation": f"""WITH RECURSIVE edge AS MATERIALIZED (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL})
    WHERE sid < {SCC_ID_LIM} AND tid < {SCC_ID_LIM}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), reach(s, t) AS (
    SELECT sid, tid FROM edge
    UNION
    SELECT r.s, e.tid FROM reach r JOIN edge e ON e.sid = r.t
), mutual AS (
    SELECT r1.s AS v, r1.t AS u
    FROM reach r1 JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s
), labels AS (
    SELECT verts.v,
           least(verts.v, coalesce(min(mutual.u), verts.v)) AS comp
    FROM verts LEFT JOIN mutual ON mutual.v = verts.v
    GROUP BY verts.v
)
SELECT DISTINCT ls.comp AS ca, lt.comp AS cb
FROM edge e
JOIN labels ls ON ls.v = e.sid
JOIN labels lt ON lt.v = e.tid
WHERE ls.comp <> lt.comp""",
})

from adopt_spark.functions.sketch import kmv_distinct_sql as _kmv_sql  # noqa: E402

ORACLES["r_kmv_distinct"] = _kmv_sql("orders", "o_custkey", k=256)

from adopt_spark.functions.sketch import (  # noqa: E402
    count_min_estimates_sql as _cms_sql,
)

ORACLES["r_countmin"] = _cms_sql("events", "user_id")

from adopt_spark.functions.sampling import (  # noqa: E402
    weighted_sample_topk_sql as _ws_sql,
)

ORACLES["t_weighted_sample"] = _ws_sql("documents", "doc_id", "n_chars", k=20)
ORACLES["a_coloring"] = _og.coloring_fixed_sql(
    f"SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) "
    f"WHERE sid < {SCC_ID_LIM} AND tid < {SCC_ID_LIM}")
ORACLES["a_simrank"] = _og.simrank_sql(
    f"SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) "
    f"WHERE sid < {SCC_ID_LIM} AND tid < {SCC_ID_LIM}")
ORACLES["g_truss_numbers"] = _og.truss_numbers_sql(DERIVED_EDGE_SQL)
# 2-approx vertex cover = endpoints of the (unrolled) greedy matching.
ORACLES["a_vertex_cover"] = f"""WITH m AS MATERIALIZED (
{_og.matching_fixed_sql(DERIVED_EDGE_SQL)}
)
SELECT DISTINCT v FROM (
    SELECT sid AS v FROM m
    UNION
    SELECT tid FROM m
)"""
ORACLES["a_dag_depth"] = _og.dag_depth_sql(SPARSE_EDGE_SQL)
ORACLES["t_entity_resolution"] = _ent.resolve_entities_sql(
    "SELECT * FROM part", "p_name", 2)
ORACLES["r_chi_square"] = """WITH cells AS (
    SELECT l_returnflag, l_linestatus, count(*) AS o
    FROM lineitem GROUP BY l_returnflag, l_linestatus
), rows_m AS (
    SELECT l_returnflag, sum(o) AS rn FROM cells GROUP BY l_returnflag
), cols_m AS (
    SELECT l_linestatus, sum(o) AS cn FROM cells GROUP BY l_linestatus
), tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
SELECT count(*) AS n_cells,
       max(t.n) AS n_rows,
       round(sum((c.o - r.rn * cm.cn / CAST(t.n AS DOUBLE))
                 ^ 2 / (r.rn * cm.cn / CAST(t.n AS DOUBLE))), 6) AS chi2
FROM cells c
JOIN rows_m r USING (l_returnflag)
JOIN cols_m cm USING (l_linestatus), tot t"""
ORACLES["e_interarrival"] = """WITH gaps AS (
    SELECT event_type,
           (t - lag(t) OVER (PARTITION BY user_id, event_type
                             ORDER BY t)) / 1e6 AS g
    FROM (SELECT event_type, user_id, epoch_us(ts) AS t FROM events)
)
SELECT event_type, count(*) AS n_gaps,
       round(avg(g), 6) AS mean_s,
       round(quantile_cont(g, 0.5), 6) AS p50_s,
       round(quantile_cont(g, 0.95), 6) AS p95_s
FROM gaps WHERE g IS NOT NULL
GROUP BY event_type"""
_HEAPS_POINTS_SQL = "\nUNION ALL\n".join(
    f"""SELECT CAST({k} AS INTEGER) AS prefix_docs,
       count(*) AS n_tokens, count(DISTINCT w) AS vocab
FROM toks WHERE doc_id < {k}""" for k in HEAPS_PREFIXES)
ORACLES["t_heaps_law"] = f"""WITH toks AS MATERIALIZED (
    SELECT doc_id, w
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM documents)
    WHERE w <> ''
), pts AS MATERIALIZED (
{_HEAPS_POINTS_SQL}
), fit AS (
    SELECT round(regr_slope(ln(vocab), ln(n_tokens)), 6) AS beta,
           round(regr_intercept(ln(vocab), ln(n_tokens)), 6) AS ln_k
    FROM pts
)
SELECT pts.*, fit.beta, fit.ln_k FROM pts, fit"""
ORACLES["e_rolling_wau"] = """WITH ev AS MATERIALIZED (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), days AS (
    SELECT DISTINCT d FROM ev
)
SELECT strftime(w.d, '%Y-%m-%d') AS day,
       count(DISTINCT e.user_id) AS wau
FROM days w JOIN ev e
  ON e.d <= w.d AND e.d >= w.d - INTERVAL 6 DAY
GROUP BY w.d"""
ORACLES["g_transitivity"] = f"""{_EDGE_CTE},
tri AS (SELECT CAST(n AS BIGINT) AS n_triangles FROM ({clique_sql(3)})),
sym AS MATERIALIZED (
    SELECT sid AS u, tid AS v FROM edge WHERE sid <> tid
    UNION SELECT tid, sid FROM edge WHERE sid <> tid
),
wedges AS (
    SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
    FROM (SELECT u, count(*) AS deg FROM sym GROUP BY u)
)
SELECT n_triangles, n_wedges,
       round(3 * n_triangles / CAST(n_wedges AS DOUBLE), 6) AS transitivity
FROM tri, wedges"""
ORACLES["g_path_counts"] = f"""WITH e AS MATERIALIZED (
{SPARSE_EDGE_SQL}
), lt AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM e WHERE sid <> tid
), p2 AS MATERIALIZED (
    SELECT x.a AS u, y.b AS w, count(*) AS c
    FROM lt x JOIN lt y ON x.b = y.a
    GROUP BY x.a, y.b
)
SELECT CAST((SELECT COALESCE(sum(c), 0) FROM p2) AS BIGINT) AS n_paths2,
       CAST((SELECT COALESCE(sum(p2.c), 0)
             FROM p2 JOIN lt ON lt.a = p2.w) AS BIGINT) AS n_paths3"""
ORACLES["t_lang_confusion"] = f"""WITH pred AS (
{_og.lang_id_sql()}
)
SELECT d.lang, p.lang_pred AS pred, count(*) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.lang, p.lang_pred"""
ORACLES["t_containment"] = _dd.CONTAINMENT_SQL
ORACLES["r_cond_agg"] = """SELECT l_linestatus, count(*) AS n,
       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       CAST(COALESCE(sum(l_quantity) FILTER (WHERE l_quantity > 30), 0)
            AS DOUBLE) AS qty_big,
       count(*) FILTER (WHERE l_returnflag = 'R' AND l_quantity > 30)
           AS n_ret_big
FROM lineitem GROUP BY l_linestatus"""
ORACLES["r_json_extract"] = """SELECT
    CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS kb,
    count(*) AS n,
    CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CAST(json_extract(props, '$.k') AS INTEGER) % 10"""
_DELTA_EDGE_SQL = f"""SELECT DISTINCT sid, tid FROM (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL})
    UNION ALL
    SELECT CAST(l_partkey % 2000 AS BIGINT) AS sid,
           CAST(l_suppkey % 2000 AS BIGINT) AS tid
    FROM lineitem
    WHERE l_suppkey % 7 = 0 AND l_partkey % 2000 <> l_suppkey % 2000
)"""
ORACLES["a_pagerank_delta"] = f"""SELECT a.v,
       a.rank AS rank_before, b.rank AS rank_after,
       round(b.rank - a.rank, 6) AS delta
FROM ({_og.pagerank_fixed_sql(DERIVED_EDGE_SQL)}) a
JOIN ({_og.pagerank_fixed_sql(_DELTA_EDGE_SQL)}) b USING (v)"""
ORACLES["a_hub_robustness"] = f"""WITH RECURSIVE edge AS (
SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) WHERE sid < 600 AND tid < 600
), sym AS MATERIALIZED (
    SELECT sid AS u, tid AS v FROM edge WHERE sid <> tid
    UNION SELECT tid, sid FROM edge WHERE sid <> tid
), deg AS (
    SELECT u, count(*) AS deg FROM sym GROUP BY u
), hubs AS MATERIALIZED (
    SELECT u FROM (
        SELECT u, row_number() OVER (ORDER BY deg DESC, u) AS rn FROM deg
    ) WHERE rn <= 10
), fsym AS MATERIALIZED (
    SELECT u, v FROM sym
    WHERE u NOT IN (SELECT u FROM hubs) AND v NOT IN (SELECT u FROM hubs)
), reach_b(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach_b w JOIN sym s ON s.u = w.v
), reach_a(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM fsym)
    UNION
    SELECT s.v, w.r FROM reach_a w JOIN fsym s ON s.u = w.v
), lcc_b AS (
    SELECT max(n) AS m FROM (
        SELECT comp, count(*) AS n FROM (
            SELECT v, min(r) AS comp FROM reach_b GROUP BY v
        ) GROUP BY comp)
), lcc_a AS (
    SELECT max(n) AS m FROM (
        SELECT comp, count(*) AS n FROM (
            SELECT v, min(r) AS comp FROM reach_a GROUP BY v
        ) GROUP BY comp)
)
SELECT lcc_b.m AS lcc_before, lcc_a.m AS lcc_after FROM lcc_b, lcc_a"""
ORACLES["e_group_ols"] = """SELECT event_type, count(*) AS n,
       round(regr_slope(value, x), 6) AS slope,
       round(regr_intercept(value, x), 6) AS intercept
FROM (SELECT event_type, value,
             (epoch_us(ts) - 1704067200000000) / 86400e6 AS x
      FROM events)
GROUP BY event_type"""
ORACLES["r_key_skew"] = """WITH per AS (
    SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY l_orderkey
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
           max(c) AS max_key_rows
    FROM per
)
SELECT t.n_rows, t.n_keys, t.max_key_rows,
       round(t.max_key_rows / CAST(t.n_rows AS DOUBLE), 6) AS top_share,
       (SELECT round(-sum((c / CAST(t.n_rows AS DOUBLE))
                          * ln(c / CAST(t.n_rows AS DOUBLE))), 6)
        FROM per) AS entropy
FROM tot t"""
ORACLES["e_audience_overlap"] = """WITH ut AS MATERIALIZED (
    SELECT DISTINCT user_id, event_type FROM events
), per AS (
    SELECT event_type, count(*) AS n FROM ut GROUP BY event_type
), ov AS (
    SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT t1, t2, n_both,
       round(n_both / CAST(p1.n + p2.n - n_both AS DOUBLE), 6) AS jaccard
FROM ov
JOIN per p1 ON p1.event_type = t1
JOIN per p2 ON p2.event_type = t2"""
ORACLES["e_id_islands"] = """WITH grp AS (
    SELECT user_id, event_id,
           event_id - row_number() OVER (PARTITION BY user_id
                                         ORDER BY event_id) AS g,
           event_id - lag(event_id) OVER (PARTITION BY user_id
                                          ORDER BY event_id) - 1 AS gap
    FROM events
), islands AS (
    SELECT user_id, g, count(*) AS len FROM grp GROUP BY user_id, g
), per_user AS (
    SELECT user_id, count(*) AS n_islands, max(len) AS max_island
    FROM islands GROUP BY user_id
), gaps AS (
    SELECT user_id, COALESCE(max(gap), 0) AS max_gap
    FROM grp GROUP BY user_id
)
SELECT user_id, n_islands, max_island, max_gap
FROM per_user JOIN gaps USING (user_id)"""
ORACLES["e_twa_value"] = """WITH seg AS (
    SELECT user_id, epoch_us(ts) AS t, value,
           lead(epoch_us(ts)) OVER w AS t2,
           lead(value) OVER w AS v2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), value)
)
SELECT user_id,
       round(sum((t2 - t) * (value + v2) / 2)
             / (max(t2) - min(t)), 6) AS twa
FROM seg WHERE t2 IS NOT NULL
GROUP BY user_id
HAVING max(t2) - min(t) > 0"""
# MATERIALIZED is load-bearing: inlined, DuckDB re-plans lif per join
# leg and picks a catastrophic order (minutes instead of ~1 s).
ORACLES["r_frequent_triples"] = """WITH li AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
), f1 AS MATERIALIZED (
    SELECT i FROM li GROUP BY i HAVING count(*) >= 4
), lif AS MATERIALIZED (
    SELECT li.b, li.i FROM li JOIN f1 USING (i)
)
SELECT a.i AS i1, b.i AS i2, c.i AS i3, count(*) AS support
FROM lif a
JOIN lif b ON a.b = b.b AND a.i < b.i
JOIN lif c ON a.b = c.b AND b.i < c.i
GROUP BY a.i, b.i, c.i
HAVING count(*) >= 2"""
ORACLES["e_compact_lww"] = """SELECT k, event_id, event_type, value
FROM (
    SELECT event_id % 997 AS k, event_id, event_type, value,
           row_number() OVER (PARTITION BY event_id % 997
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1"""
ORACLES["e_daily_p95"] = """SELECT event_type,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type, CAST(ts AS DATE)"""
ORACLES["r_order_lines_agg"] = """SELECT l_orderkey,
       list_aggregate(list_sort(list(l_linenumber)), 'string_agg', ',')
           AS lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem WHERE l_orderkey < 500
GROUP BY l_orderkey"""
ORACLES["r_fk_audit"] = """
SELECT 'lineitem->orders' AS rel, count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_keys,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
       AS n_orphans
FROM lineitem
UNION ALL
SELECT 'lineitem->part', count(*), count(DISTINCT l_partkey),
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
FROM lineitem
UNION ALL
SELECT 'orders->customer', count(*), count(DISTINCT o_custkey),
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
FROM orders"""
ORACLES["g_snapshot_diff"] = """WITH a AS (
    SELECT DISTINCT l_orderkey % 2000 AS sid, l_partkey % 2000 AS tid
    FROM lineitem WHERE l_shipdate < DATE '1995-07-01'
      AND l_orderkey % 2000 <> l_partkey % 2000
), b AS (
    SELECT DISTINCT l_orderkey % 2000 AS sid, l_partkey % 2000 AS tid
    FROM lineitem WHERE l_shipdate >= DATE '1995-07-01'
      AND l_orderkey % 2000 <> l_partkey % 2000
)
SELECT
  (SELECT count(*) FROM b WHERE EXISTS
     (SELECT 1 FROM a WHERE a.sid = b.sid AND a.tid = b.tid)) AS kept,
  (SELECT count(*) FROM b WHERE NOT EXISTS
     (SELECT 1 FROM a WHERE a.sid = b.sid AND a.tid = b.tid)) AS added,
  (SELECT count(*) FROM a WHERE NOT EXISTS
     (SELECT 1 FROM b WHERE b.sid = a.sid AND b.tid = a.tid)) AS removed"""
# Recall@5 of the LSH ANN vs brute-force truth: the join of the two
# existing SQL twins (each independently hash-checked on its own row).
ORACLES["s_ann_recall"] = f"""SELECT CAST(3 AS INTEGER) AS n_queries,
       CAST(5 AS INTEGER) AS k,
       count(*) AS hits,
       round(count(*) / 15.0, 6) AS recall
FROM ({_og.knn_lsh_sql(k=5, bands=4)}) a
JOIN ({ORACLES["s_knn_bruteforce"]}) e USING (q_id, vec_id)"""
ORACLES["g_wl_colors"] = _og.wl_fixed_sql(DERIVED_EDGE_SQL)

from adopt_spark.functions.kmeans import (  # noqa: E402
    kmeans_assign_sql as _kmeans_sql,
)

ORACLES["s_kmeans"] = _kmeans_sql()
ORACLES["e_retention"] = """
WITH ev AS (
    SELECT user_id, date_trunc('week', ts) AS wk FROM events
), first_wk AS (
    SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id
)
SELECT strftime(CAST(f.cohort AS DATE), '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', CAST(f.cohort AS DATE),
                      CAST(e.wk AS DATE)) / 7 AS INTEGER) AS week_offset,
       count(DISTINCT e.user_id) AS active_users
FROM ev e JOIN first_wk f USING (user_id)
GROUP BY 1, 2"""

from adopt_spark.functions.funnel import (  # noqa: E402
    funnel_oracle_sql as _funnel_sql,
)

ORACLES["e_funnel"] = _funnel_sql(
    ["view", "click", "purchase"], within="7 DAYS")
ORACLES["t_heavy_hitters"] = """
WITH arr AS (
    SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS a
    FROM documents
), toks AS (
    SELECT unnest(a) AS w FROM arr
), tot AS (
    SELECT count(*) AS n FROM toks
)
SELECT w, count(*) AS cnt FROM toks, tot GROUP BY w, tot.n
HAVING count(*) * 30 >= tot.n * 1"""

from adopt_spark.functions.sketch import (  # noqa: E402
    kmv_distinct_by_sql as _kmv_by_sql,
)

ORACLES["r_kmv_by_group"] = _kmv_by_sql(
    "orders", "o_orderpriority", "o_custkey", k=256)
from adopt_spark.functions.sketch import (  # noqa: E402
    hll_distinct_by_sql as _hll_by_sql,
)
ORACLES["r_hll_by_group"] = _hll_by_sql(
    "orders", "o_orderpriority", "o_custkey")
ORACLES["a_msbfs_seeds"] = _og.shortest_path_sql(
    SPARSE_EDGE_SQL, _og.BFS_ROUNDS, weighted=False, directed=False,
    sources_sql="SELECT DISTINCT sid FROM edge ORDER BY sid LIMIT 5")
ORACLES["a_pagerank_weighted"] = _og.pagerank_fixed_sql(
    DERIVED_EDGE_SQL, weighted=True)
ORACLES["a_pagerank_personal"] = _og.pagerank_fixed_sql(
    DERIVED_EDGE_SQL, personalized=3)

ORACLES["g_degree_stats"] = f"""
WITH edge AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), outd AS (
    SELECT sid, count(*) AS outdeg FROM edge GROUP BY 1
), ind AS (
    SELECT tid, count(*) AS indeg FROM edge GROUP BY 1
), pe AS (
    SELECT o.outdeg, i.indeg
    FROM edge e JOIN outd o USING (sid) JOIN ind i USING (tid)
)
SELECT
  (SELECT count(*)
   FROM (SELECT sid AS v FROM edge UNION SELECT tid FROM edge)) AS n_vertices,
  (SELECT count(*) FROM edge) AS n_edges,
  (SELECT round(avg(outdeg), 6) FROM outd) AS avg_outdeg,
  (SELECT max(outdeg) FROM outd) AS max_outdeg,
  (SELECT round(avg(indeg), 6) FROM ind) AS avg_indeg,
  (SELECT max(indeg) FROM ind) AS max_indeg,
  (SELECT round(corr(CAST(outdeg AS DOUBLE), CAST(indeg AS DOUBLE)), 6)
   FROM pe) AS assortativity
""".strip()

ORACLES["t_stratified_sample"] = """
SELECT doc_id, lang,
       CAST(((doc_id % 100000007) * 2654435761 + 11)
            % 1000000007 % 1000 AS INT) AS gate,
       CAST(CASE WHEN lang = 'en' THEN 200
                 WHEN lang = 'zh' THEN 800 ELSE 500 END AS INT) AS rate
FROM documents
WHERE ((doc_id % 100000007) * 2654435761 + 11) % 1000000007 % 1000
      < CASE WHEN lang = 'en' THEN 200
             WHEN lang = 'zh' THEN 800 ELSE 500 END
""".strip()

ORACLES["t_tfidf_top"] = """
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term <> '' GROUP BY 1, 2
), n AS (
    SELECT count(DISTINCT doc_id) AS n FROM documents
), dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * round(ln((CAST((SELECT n FROM n) AS DOUBLE) + 1)
                            / (dfreq.df + 1)) + 1, 6) AS tfidf
    FROM tf JOIN dfreq USING (term)
), ranked AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term ASC) AS rn
    FROM scored
)
SELECT doc_id, term, CAST(round(tfidf, 4) AS DOUBLE) AS tfidf,
       CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 5
""".strip()
# Pivot-BFS oracles: rounds=16 dominates the measured max pivot
# eccentricity (8 at sf0.001, 3 at sf0.01) with 2x margin — the same
# budget-domination argument as the shortest-path oracles; pytest
# guards the domination at fixture scale.
_PIVOT_SQL = _og.pivot_distance_sql(DERIVED_EDGE_SQL, rounds=16,
                                    n_pivots=4, directed=True)
ORACLES["a_eccentricity"] = f"""
SELECT pivot_id, max(dist) AS ecc, count(*) AS n_reached
FROM ({_PIVOT_SQL})
GROUP BY pivot_id
""".strip()
ORACLES["a_harmonic"] = f"""
SELECT v, round(sum(1.0 / dist), 6) AS harmonic
FROM ({_PIVOT_SQL})
WHERE dist > 0
GROUP BY v
""".strip()

ORACLES["g_copurchase"] = """
WITH gi AS (
    SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS BIGINT) AS item
    FROM lineitem
), ok AS (
    SELECT g FROM gi GROUP BY g HAVING count(*) <= 16
), gg AS (
    SELECT gi.g, gi.item FROM gi JOIN ok USING (g)
)
SELECT a.item AS sid, b.item AS tid, count(*) AS weight
FROM gg a JOIN gg b ON a.g = b.g AND a.item < b.item
GROUP BY 1, 2
HAVING count(*) >= 2
""".strip()

ORACLES["s_label_centroids"] = """
SELECT label,
       CAST(i - 1 AS INT) AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
FROM (
    SELECT label, embedding,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
)
GROUP BY 1, 2
""".strip()

_CP_SYM_SQL = f"""
SELECT sid, tid, CAST(weight AS DOUBLE) AS w FROM ({ORACLES["g_copurchase"]})
UNION ALL
SELECT tid AS sid, sid AS tid, CAST(weight AS DOUBLE) AS w
FROM ({ORACLES["g_copurchase"]})
""".strip()
ORACLES["a_pagerank_copurchase"] = _og.pagerank_fixed_sql(
    _CP_SYM_SQL, weighted_inline=True)

ORACLES["e_interval_overlap"] = """
WITH base AS (
    -- floor(), not CAST: epoch() keeps microseconds and BIGINT CAST
    -- rounds-to-nearest, while Spark's unix_timestamp truncates
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS s,
           CAST(floor(epoch(ts)) AS BIGINT) + 60 + event_id % 240 AS e,
           event_type
    FROM events
), l AS (
    SELECT event_id, s, e FROM base WHERE event_type = 'error'
), r AS (
    SELECT event_id, s, e FROM base WHERE event_type = 'purchase'
)
SELECT l.event_id, l.s, l.e,
       r.event_id AS event_id_r, r.s AS s_r, r.e AS e_r
FROM l JOIN r ON l.s <= r.e AND r.s <= l.e
""".strip()

_LPA_LABELS_SQL = _og.lpa_fixed_sql(DERIVED_EDGE_SQL, output="labels")
ORACLES["a_lpa_modularity"] = f"""
WITH lab AS MATERIALIZED (
    SELECT v, label FROM ({_LPA_LABELS_SQL})
), e2 AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), m AS (SELECT count(*) AS m FROM e2),
wi AS (
    SELECT count(*) AS within
    FROM e2 JOIN lab a ON a.v = e2.sid JOIN lab b ON b.v = e2.tid
    WHERE a.label = b.label
), outd AS (SELECT sid AS v, count(*) AS k FROM e2 GROUP BY 1),
ind AS (SELECT tid AS v, count(*) AS k FROM e2 GROUP BY 1),
comm AS (
    SELECT lab.label,
           coalesce(sum(o.k), 0) AS dout,
           coalesce(sum(i.k), 0) AS din
    FROM lab LEFT JOIN outd o ON o.v = lab.v
             LEFT JOIN ind i ON i.v = lab.v
    GROUP BY 1
)
SELECT (SELECT m FROM m) AS n_edges,
       (SELECT count(*) FROM comm) AS n_communities,
       round((SELECT within FROM wi) / CAST((SELECT m FROM m) AS DOUBLE)
             - (SELECT sum(dout * din) FROM comm)
               / CAST((SELECT m FROM m) * (SELECT m FROM m) AS DOUBLE),
             6) AS modularity
""".strip()

ORACLES["a_louvain_sizes"] = _og.louvain_fixed_sql(DERIVED_EDGE_SQL)

ORACLES["e_temporal_reach"] = _og.temporal_reach_sql()

ORACLES["e_temporal_triangles"] = _og.temporal_triangles_sql()

# independent from-scratch recompute (recursive reachability) — the
# incremental path must reproduce it exactly
ORACLES["a_incremental_cc"] = f"""
WITH RECURSIVE edge AS MATERIALIZED (
    SELECT * FROM ({SPARSE_EDGE_SQL})
    WHERE sid < 3000 AND tid < 3000
), sym AS MATERIALIZED (
    SELECT sid AS u, tid AS v FROM edge
    UNION
    SELECT tid, sid FROM edge
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
)
SELECT component, count(*) AS size FROM (
    SELECT v, min(r) AS component FROM reach GROUP BY v
) GROUP BY component"""

# the streaming fold must land on the identical from-scratch answer
ORACLES["e_stream_cc"] = ORACLES["a_incremental_cc"]

ORACLES["a_threshold_cascade"] = _og.cascade_fixed_sql(DERIVED_EDGE_SQL)

ORACLES["e_autocorr"] = """
WITH counts AS MATERIALIZED (
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS x
    FROM events GROUP BY 1
), b AS (
    SELECT min(h) AS hmin, max(h) AS hmax,
           sum(x) AS sx, sum(x * x) AS sxx
    FROM counts
), lags(k) AS (VALUES (1), (2), (3), (24)),
sums AS (
    SELECT l.k,
           sum(CASE WHEN c.h <= b.hmax - l.k THEN c.x ELSE 0 END) AS s1,
           sum(CASE WHEN c.h >= b.hmin + l.k THEN c.x ELSE 0 END) AS s2
    FROM counts c, b, lags l GROUP BY l.k
), sxyt AS (
    SELECT l.k, sum(c1.x * c2.x) AS sxy
    FROM lags l
    JOIN counts c1 ON true
    JOIN counts c2 ON c2.h = c1.h + l.k
    GROUP BY l.k
), f AS (
    SELECT s.k,
           CAST(b.hmax - b.hmin + 1 AS HUGEINT) AS n,
           CAST(coalesce(x.sxy, 0) AS HUGEINT) AS sxy,
           CAST(b.sx AS HUGEINT) AS sx, CAST(b.sxx AS HUGEINT) AS sxx,
           CAST(s.s1 AS HUGEINT) AS s1, CAST(s.s2 AS HUGEINT) AS s2
    FROM sums s LEFT JOIN sxyt x ON x.k = s.k, b
)
SELECT k,
       CAST(n - k AS BIGINT) AS n_pairs,
       CASE WHEN n * (n * sxx - sx * sx) <> 0 THEN
           round(CAST(n * n * sxy - n * sx * (s1 + s2)
                      + (n - k) * sx * sx AS DOUBLE)
                 / CAST(n * (n * sxx - sx * sx) AS DOUBLE), 6)
       END AS autocorr
FROM f"""

ORACLES["r_benford"] = """
WITH cents AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
    FROM orders
), per AS (
    SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           count(*) AS n
    FROM cents GROUP BY 1
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM per)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / nn, 6) AS obs_p,
       round(log10(1.0 + 1.0 / digit), 6) AS exp_p,
       round(pow(CAST(n AS DOUBLE) - nn * log10(1.0 + 1.0 / digit), 2)
             / (nn * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
FROM per, tot"""

# Shared recursive core for the bridge family: BFS forest + cycle
# cover over the id-bounded sparse graph (see q_bridges for bounds).
_BRIDGE_CORE_SQL = f"""
WITH RECURSIVE edge AS MATERIALIZED (
    SELECT * FROM ({SPARSE_EDGE_SQL})
    WHERE sid < 3000 AND tid < 3000
), sym AS MATERIALIZED (
    SELECT sid AS u, tid AS v FROM edge
    UNION
    SELECT tid, sid FROM edge
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), roots AS MATERIALIZED (
    SELECT DISTINCT comp AS root FROM (
        SELECT v, min(r) AS comp FROM reach GROUP BY v
    )
), bfs(v, d) AS (
    SELECT root, 0 FROM roots
    UNION
    SELECT s.v, b.d + 1 FROM bfs b JOIN sym s ON s.u = b.v
    WHERE b.d < 64
), dist AS MATERIALIZED (
    SELECT v, min(d) AS d FROM bfs GROUP BY v
), parent AS MATERIALIZED (
    SELECT s.u AS child, min(s.v) AS par
    FROM sym s
    JOIN dist du ON du.v = s.u
    JOIN dist dn ON dn.v = s.v
    WHERE dn.d = du.d - 1
    GROUP BY s.u
), nontree AS MATERIALIZED (
    SELECT e.a, e.b, da.d AS da, db.d AS db
    FROM (SELECT u AS a, v AS b FROM sym WHERE u < v) e
    JOIN dist da ON da.v = e.a
    JOIN dist db ON db.v = e.b
    WHERE NOT EXISTS (
        SELECT 1 FROM parent t
        WHERE (t.child = e.a AND t.par = e.b)
           OR (t.child = e.b AND t.par = e.a))
), walk(pu, pv, du, dv) AS (
    SELECT a, b, da, db FROM nontree
    UNION ALL
    SELECT CASE WHEN w.du >= w.dv THEN tu.par ELSE w.pu END,
           CASE WHEN w.dv >= w.du THEN tv.par ELSE w.pv END,
           CASE WHEN w.du >= w.dv THEN w.du - 1 ELSE w.du END,
           CASE WHEN w.dv >= w.du THEN w.dv - 1 ELSE w.dv END
    FROM walk w
    LEFT JOIN parent tu ON tu.child = w.pu
    LEFT JOIN parent tv ON tv.child = w.pv
    WHERE w.pu <> w.pv
), covered AS MATERIALIZED (
    SELECT pu AS child FROM walk WHERE pu <> pv AND du >= dv
    UNION
    SELECT pv FROM walk WHERE pu <> pv AND dv >= du
), bridge AS MATERIALIZED (
    SELECT least(t.child, t.par) AS u, greatest(t.child, t.par) AS v
    FROM parent t
    WHERE t.child NOT IN (SELECT child FROM covered)
)"""

ORACLES["a_bridges"] = _BRIDGE_CORE_SQL + """
SELECT u, v FROM bridge"""

ORACLES["e_stream_topk"] = """
WITH c AS (
    SELECT strftime(date_trunc('hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT window_start, user_id, n, CAST(rnk AS INTEGER) AS rank
FROM (SELECT window_start, user_id, n,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n DESC, user_id) AS rnk
      FROM c)
WHERE rnk <= 3"""

ORACLES["a_2ecc_sizes"] = _BRIDGE_CORE_SQL + """
, sym2 AS MATERIALIZED (
    SELECT s.u, s.v FROM sym s
    WHERE NOT EXISTS (SELECT 1 FROM bridge b
                      WHERE b.u = least(s.u, s.v)
                        AND b.v = greatest(s.u, s.v))
), reach2(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym2)
    UNION
    SELECT s.v, w.r FROM reach2 w JOIN sym2 s ON s.u = w.v
), comp2 AS MATERIALIZED (
    SELECT v, min(r) AS component FROM reach2 GROUP BY v
    UNION ALL
    -- vertices whose every incident edge is a bridge are their own
    -- 2-edge-connected component
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    WHERE u NOT IN (SELECT v FROM reach2)
)
SELECT size, count(*) AS n_components FROM (
    SELECT component, count(*) AS size FROM comp2 GROUP BY component
) GROUP BY size"""

ORACLES["s_knn_graph"] = """
WITH RECURSIVE ex AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
), norms AS MATERIALIZED (
    SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id
), dots AS MATERIALIZED (
    SELECT q.vec_id AS a, e.vec_id AS b, sum(q.x * e.x) AS dot
    FROM ex q JOIN ex e USING (i)
    WHERE q.vec_id <> e.vec_id
    GROUP BY 1, 2
), knn AS MATERIALIZED (
    SELECT a, b FROM (
        SELECT d.a, d.b,
               row_number() OVER (
                   PARTITION BY d.a
                   ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.b) AS rnk
        FROM dots d
        JOIN norms na ON na.vec_id = d.a
        JOIN norms nb ON nb.vec_id = d.b
    ) WHERE rnk <= 3
), mutual AS MATERIALIZED (
    SELECT k1.a, k1.b FROM knn k1
    JOIN knn k2 ON k2.a = k1.b AND k2.b = k1.a
), sym AS MATERIALIZED (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM mutual
    UNION
    SELECT greatest(a, b), least(a, b) FROM mutual
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), comp AS MATERIALIZED (
    SELECT v, min(r) AS component FROM reach GROUP BY v
    UNION ALL
    SELECT vec_id, vec_id FROM embeddings
    WHERE vec_id NOT IN (SELECT v FROM reach)
), lab AS (
    SELECT c.component, e.label AS l, count(*) AS n
    FROM comp c JOIN embeddings e ON e.vec_id = c.v
    GROUP BY 1, 2
), top AS (
    SELECT component, l, n,
           row_number() OVER (PARTITION BY component
                              ORDER BY n DESC, l) AS rnk
    FROM lab
)
SELECT s.component, s.size,
       t.l AS top_label, t.n AS top_label_n
FROM (SELECT component, count(*) AS size FROM comp GROUP BY 1) s
JOIN top t ON t.component = s.component AND t.rnk = 1"""

ORACLES["e_ewma"] = """
WITH base AS (
    SELECT user_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) DESC, event_id DESC
                              ) AS i
    FROM events
), lastk AS (SELECT * FROM base WHERE i <= 16)
SELECT user_id,
       count(*) AS n_used,
       round(CAST(sum(CAST(pow(2, 16 - i) AS BIGINT) * v100) AS DOUBLE)
             / CAST(sum(CAST(pow(2, 16 - i) AS BIGINT)) AS DOUBLE)
             / 100.0, 6) AS ewma
FROM lastk GROUP BY user_id"""

ORACLES["e_sessionize_batch"] = """
WITH base AS (
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS t,
           event_id AS tie
    FROM events
), marked AS (
    SELECT user_id, t, tie,
           CASE WHEN t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS brk
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY t, tie)
), sess AS (
    SELECT user_id, t,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, tie
                               ROWS UNBOUNDED PRECEDING) + 1
                AS BIGINT) AS session_idx
    FROM marked
)
SELECT user_id, session_idx,
       min(t) AS s_start, max(t) AS s_end, count(*) AS n_events
FROM sess
GROUP BY 1, 2
""".strip()

ORACLES["g_triad_counts"] = f"""
WITH edge AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), cyc AS (
    SELECT count(*) AS n_cyclic
    FROM edge e1 JOIN edge e2 ON e2.sid = e1.tid
                 JOIN edge e3 ON e3.sid = e2.tid AND e3.tid = e1.sid
    WHERE e1.sid < e1.tid AND e1.sid < e2.tid
), tra AS (
    SELECT count(*) AS n_transitive
    FROM edge e1 JOIN edge e2 ON e2.sid = e1.tid
                 JOIN edge e3 ON e3.sid = e1.sid AND e3.tid = e2.tid
)
SELECT cyc.n_cyclic, tra.n_transitive FROM cyc, tra
""".strip()

ORACLES["t_char_entropy"] = """
WITH chars AS (
    SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
    FROM documents
), cc AS (
    SELECT doc_id, ch, count(*) AS c
    FROM chars WHERE ch <> '' GROUP BY 1, 2
), tot AS (
    SELECT doc_id, sum(c) AS n FROM cc GROUP BY 1
), ent AS (
    SELECT cc.doc_id,
           round(-sum((cc.c / CAST(t.n AS DOUBLE))
                      * log2(cc.c / CAST(t.n AS DOUBLE))), 6) AS entropy,
           CAST(any_value(t.n) AS BIGINT) AS n_chars
    FROM cc JOIN tot t USING (doc_id)
    GROUP BY 1
)
SELECT d.doc_id,
       coalesce(e.n_chars, 0) AS n_chars,
       coalesce(e.entropy, 0.0) AS entropy
FROM documents d LEFT JOIN ent e USING (doc_id)
""".strip()

ORACLES["t_dedup_report"] = f"""
WITH sizes AS (
    SELECT cluster, count(*) AS sz
    FROM ({_og.NEAR_DUP_CLUSTERS_SQL})
    GROUP BY 1
)
SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) - count(*) AS BIGINT) AS n_duplicates,
       CAST(max(sz) AS BIGINT) AS max_cluster_size,
       round((sum(sz) - count(*)) / CAST(sum(sz) AS DOUBLE), 6)
           AS dup_rate
FROM sizes
""".strip()

ORACLES["t_quality_gate"] = f"""
WITH scored AS (
    SELECT doc_id, lang, {_QUALITY_SQL} AS q FROM documents
), ranked AS (
    SELECT doc_id, lang, q,
           percent_rank() OVER (PARTITION BY lang
                                ORDER BY q DESC, doc_id ASC) AS pr
    FROM scored
)
SELECT doc_id, lang, q, round(pr, 6) AS pr
FROM ranked WHERE pr <= 0.5
""".strip()

ORACLES["t_pipeline_e2e"] = f"""
WITH scored AS (
    SELECT doc_id, lang, text, {_QUALITY_SQL} AS q FROM documents
), ranked AS (
    SELECT doc_id, lang, text,
           percent_rank() OVER (PARTITION BY lang
                                ORDER BY q DESC, doc_id ASC) AS pr
    FROM scored
), kept AS (
    SELECT doc_id, lang, text FROM ranked WHERE pr <= 0.5
), norm AS (
    SELECT doc_id, lang, text,
           regexp_replace(trim(text), '\\s+', ' ', 'g') AS k
    FROM kept
), keepids AS (
    SELECT min(doc_id) AS doc_id FROM norm GROUP BY k
), docs2 AS (
    SELECT n.doc_id, n.lang, n.text FROM norm n
    JOIN keepids ki ON ki.doc_id = n.doc_id
), tagged AS (
    SELECT doc_id, lang,
           CASE WHEN (({SPLIT_A} * doc_id + {SPLIT_B})
                      % {SPLIT_M}) % 100 < 80 THEN 'train'
                WHEN (({SPLIT_A} * doc_id + {SPLIT_B})
                      % {SPLIT_M}) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM docs2
), perdoc AS (
    SELECT doc_id, count(*) AS nc, sum(n_tokens) AS nt
    FROM ({{CHUNK_SQL}}) c
    GROUP BY doc_id
)
SELECT t.split, t.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(coalesce(p.nc, 0)) AS BIGINT) AS n_chunks,
       CAST(sum(coalesce(p.nt, 0)) AS BIGINT) AS n_tokens
FROM tagged t LEFT JOIN perdoc p ON p.doc_id = t.doc_id
GROUP BY t.split, t.lang
""".strip().replace("{CHUNK_SQL}", _chunk_documents_sql(
    32, 24, "(SELECT doc_id, text FROM docs2)"))

ORACLES["a_mean_pivot_dist"] = f"""
SELECT pivot_id, round(avg(dist), 6) AS mean_dist,
       max(dist) AS max_dist, count(*) AS n_reached
FROM ({_PIVOT_SQL})
WHERE dist > 0
GROUP BY pivot_id
""".strip()

ORACLES["a_bowtie"] = f"""WITH RECURSIVE edge AS MATERIALIZED (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL})
    WHERE sid < {SCC_ID_LIM} AND tid < {SCC_ID_LIM}
), verts AS MATERIALIZED (
    -- explicit DISTINCT: inside a WITH RECURSIVE list DuckDB ran this
    -- UNION with ALL semantics (observed 2x vertex count)
    SELECT DISTINCT v FROM (
        SELECT sid AS v FROM edge UNION ALL SELECT tid FROM edge
    )
), reach(s, t) AS (
    SELECT sid, tid FROM edge
    UNION
    SELECT r.s, e.tid FROM reach r JOIN edge e ON e.sid = r.t
), mutual AS (
    SELECT r1.s AS v, r1.t AS u
    FROM reach r1 JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s
), lab AS MATERIALIZED (
    SELECT verts.v,
           least(verts.v, coalesce(min(mutual.u), verts.v)) AS comp
    FROM verts LEFT JOIN mutual ON mutual.v = verts.v
    GROUP BY verts.v
), giant AS (
    SELECT comp FROM lab GROUP BY comp
    ORDER BY count(*) DESC, comp ASC LIMIT 1
), core AS MATERIALIZED (
    SELECT v FROM lab WHERE comp = (SELECT comp FROM giant)
), outs AS (
    SELECT DISTINCT r.t AS v FROM reach r
    WHERE r.s IN (SELECT v FROM core)
      AND r.t NOT IN (SELECT v FROM core)
), ins AS (
    SELECT DISTINCT r.s AS v FROM reach r
    WHERE r.t IN (SELECT v FROM core)
      AND r.s NOT IN (SELECT v FROM core)
)
SELECT (SELECT count(*) FROM verts) AS n_vertices,
       (SELECT count(*) FROM core) AS core_size,
       (SELECT count(*) FROM ins) AS in_size,
       (SELECT count(*) FROM outs) AS out_size,
       (SELECT count(*) FROM verts) - (SELECT count(*) FROM core)
           - (SELECT count(*) FROM ins) - (SELECT count(*) FROM outs)
           AS other_size"""

ORACLES["s_centroid_sim"] = f"""
WITH cent AS (
    SELECT label AS g, pos, centroid
    FROM ({ORACLES["s_label_centroids"]})
), dots AS (
    SELECT x.g AS a, y.g AS b, sum(x.centroid * y.centroid) AS dot
    FROM cent x JOIN cent y USING (pos)
    WHERE x.g < y.g
    GROUP BY 1, 2
), norms AS (
    SELECT g, sqrt(sum(centroid * centroid)) AS nrm FROM cent GROUP BY 1
)
SELECT d.a, d.b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d JOIN norms na ON na.g = d.a JOIN norms nb ON nb.g = d.b
""".strip()

ORACLES["g_reciprocity"] = f"""
WITH edge AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), rec AS (
    SELECT count(*) AS n_reciprocal
    FROM edge e JOIN edge r ON e.sid = r.tid AND e.tid = r.sid
)
SELECT (SELECT count(*) FROM edge) AS n_edges,
       rec.n_reciprocal,
       round(CASE WHEN (SELECT count(*) FROM edge) > 0
             THEN rec.n_reciprocal
                  / CAST((SELECT count(*) FROM edge) AS DOUBLE)
             ELSE 0.0 END, 6) AS reciprocity
FROM rec
""".strip()

ORACLES["t_doc_repetition"] = """
WITH arr AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS a
    FROM documents
), toks AS (
    SELECT doc_id, unnest(a) AS w FROM arr
), wc AS (
    SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2
), words AS (
    SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
           max(c) AS max_c
    FROM wc GROUP BY 1
), pos AS (
    SELECT doc_id, a, unnest(generate_series(1, len(a) - 2)) AS i
    FROM arr
), grams AS (
    SELECT doc_id, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
    FROM pos
), gc AS (
    SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
), g3 AS (
    SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct_grams
    FROM gc GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(w.n_words, 0) AS BIGINT) AS n_words,
       round(CASE WHEN coalesce(w.n_words, 0) > 0
             THEN 1.0 - w.n_distinct / CAST(w.n_words AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_word_frac,
       round(CASE WHEN coalesce(g.n_grams, 0) > 0
             THEN 1.0 - g.n_distinct_grams / CAST(g.n_grams AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_3gram_frac,
       round(CASE WHEN coalesce(w.n_words, 0) > 0
             THEN w.max_c / CAST(w.n_words AS DOUBLE)
             ELSE 0.0 END, 6) AS top_word_frac
FROM documents d
LEFT JOIN words w USING (doc_id)
LEFT JOIN g3 g USING (doc_id)
""".strip()

ORACLES["a_hits_scores"] = _og.hits_fixed_sql(DERIVED_EDGE_SQL)
ORACLES["a_salsa_scores"] = _og.salsa_fixed_sql(DERIVED_EDGE_SQL)

from adopt_spark.algos.walks import random_walks_sql as _walks_sql  # noqa: E402

ORACLES["a_random_walks"] = _walks_sql(DERIVED_EDGE_SQL, length=8)
ORACLES["a_betweenness"] = _og.betweenness_sql(DERIVED_EDGE_SQL)

from adopt_spark.functions.sketch import (  # noqa: E402
    KMV_A as _KA, KMV_B as _KB, KMV_M as _KM,
)

ORACLES["e_stream_kmv"] = f"""
WITH h AS (
    SELECT DISTINCT
        strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
            AS window_start,
        ({_KA} * CAST(user_id AS BIGINT) + {_KB}) % {_KM} AS h
    FROM events
), r AS (
    SELECT window_start, h,
           row_number() OVER (PARTITION BY window_start ORDER BY h) AS rn
    FROM h
)
SELECT window_start,
       CASE WHEN sum(CASE WHEN rn <= 32 THEN 1 ELSE 0 END) < 32
            THEN CAST(sum(CASE WHEN rn <= 32 THEN 1 ELSE 0 END) AS DOUBLE)
            ELSE round(31 * {_KM}.0
                       / max(CASE WHEN rn <= 32 THEN h END), 4)
       END AS estimate
FROM r GROUP BY window_start
""".strip()

_ARR_CTE = """arr AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS a
    FROM documents
)"""

ORACLES["t_decontaminate"] = f"""
WITH {_ARR_CTE}, pos AS (
    SELECT doc_id, a, unnest(generate_series(1, len(a) - 3)) AS i
    FROM arr WHERE len(a) >= 4
), sh AS (
    SELECT DISTINCT doc_id, array_to_string(a[i : i + 3], ' ') AS g
    FROM pos
), bench AS (
    SELECT doc_id AS bench_doc, g FROM sh WHERE doc_id % 19 = 3
), train AS (
    SELECT doc_id, g FROM sh WHERE doc_id % 19 <> 3
)
SELECT train.doc_id,
       count(DISTINCT train.g) AS n_hit_ngrams,
       count(DISTINCT bench.bench_doc) AS n_bench_docs
FROM train JOIN bench USING (g)
GROUP BY 1
""".strip()

ORACLES["t_dup_blocks"] = f"""
WITH {_ARR_CTE}, pos AS (
    SELECT doc_id, a,
           unnest(generate_series(1, len(a) - 7, 8)) AS i
    FROM arr WHERE len(a) >= 8
), blocks AS (
    SELECT doc_id, array_to_string(a[i : i + 7], ' ') AS g FROM pos
), cnt AS (
    SELECT g, count(*) AS c FROM blocks GROUP BY 1
), per_doc AS (
    SELECT b.doc_id,
           count(*) AS n_blocks,
           sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS n_dup
    FROM blocks b JOIN cnt USING (g)
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_blocks,
       round(CASE WHEN coalesce(p.n_blocks, 0) > 0
                  THEN CAST(p.n_dup AS DOUBLE) / p.n_blocks
                  ELSE 0.0 END, 6) AS dup_block_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""".strip()

ORACLES["t_collocations"] = f"""
WITH {_ARR_CTE}, toks AS (
    SELECT unnest(a) AS w FROM arr
), uni AS (
    SELECT w, count(*) AS c1 FROM toks GROUP BY 1
), ntot AS (
    SELECT count(*) AS n FROM toks
), pos AS (
    SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
    FROM arr WHERE len(a) >= 2
), pairs AS (
    SELECT a[i] AS w1, a[i + 1] AS w2 FROM pos
), bc AS (
    SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY 1, 2
), mtot AS (
    SELECT count(*) AS m FROM pairs
), scored AS (
    SELECT bc.w1, bc.w2, bc.c_xy,
           round(CAST(bc.c_xy * ntot.n * ntot.n AS DOUBLE)
                 / CAST(mtot.m * u1.c1 * u2.c1 AS DOUBLE), 6) AS lift
    FROM bc
    JOIN uni u1 ON u1.w = bc.w1
    JOIN uni u2 ON u2.w = bc.w2
    CROSS JOIN ntot CROSS JOIN mtot
    WHERE bc.c_xy >= 10
)
SELECT w1, w2, c_xy, lift FROM scored
QUALIFY row_number() OVER (ORDER BY lift DESC, w1, w2) <= 50
""".strip()

ORACLES["a_katz"] = _og.katz_fixed_sql(DERIVED_EDGE_SQL)

ORACLES["g_butterflies"] = f"""
WITH pairs AS (
{ORACLES["g_copurchase"]}
)
SELECT CAST(coalesce(sum((weight * (weight - 1)) // 2), 0) AS BIGINT)
           AS n_butterflies,
       count(*) AS n_item_pairs,
       CAST(coalesce(max(weight), 0) AS BIGINT) AS max_pair_weight
FROM pairs
""".strip()

ORACLES["g_edge_jaccard"] = f"""
{_EDGE_CTE}, lt AS (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), sym AS (
    SELECT sid AS v, tid AS nbr FROM lt
    UNION ALL
    SELECT tid AS v, sid AS nbr FROM lt
), deg AS (
    SELECT v, count(*) AS deg FROM sym GROUP BY 1
), sup AS (
    SELECT l.sid, l.tid, count(*) AS cn
    FROM lt l
    JOIN sym s1 ON s1.v = l.sid
    JOIN sym s2 ON s2.v = l.tid AND s2.nbr = s1.nbr
    GROUP BY 1, 2
)
SELECT l.sid, l.tid,
       CAST(coalesce(sup.cn, 0) AS BIGINT) AS cn,
       round(CAST(coalesce(sup.cn, 0) AS DOUBLE)
             / (ds.deg + dt.deg - coalesce(sup.cn, 0)), 6) AS jaccard
FROM lt l
LEFT JOIN sup USING (sid, tid)
JOIN deg ds ON ds.v = l.sid
JOIN deg dt ON dt.v = l.tid
""".strip()

ORACLES["s_knn_sq8"] = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), st AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY i
), dq AS (
  SELECT ex.vec_id, ex.i,
         CASE WHEN st.hi > st.lo
              THEN st.lo + greatest(0.0, least(255.0,
                       floor((ex.x - st.lo) / (st.hi - st.lo)
                             * 255.0 + 0.5))) / 255.0 * (st.hi - st.lo)
              ELSE st.lo END AS v
  FROM ex JOIN st USING (i)
), ndq AS (
  SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM dq GROUP BY vec_id
), nq AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS q_id, e.vec_id AS vec_id, sum(q.x * e.v) AS dot
  FROM ex q JOIN dq e USING (i)
  WHERE q.vec_id < 3
  GROUP BY 1, 2
), scored AS (
  SELECT d.q_id, d.vec_id,
         CAST(round(d.dot / (nq.nrm * ne.nrm), 6) AS DOUBLE) AS cos
  FROM dots d
  JOIN nq ON nq.vec_id = d.q_id
  JOIN ndq ne ON ne.vec_id = d.vec_id
)
SELECT q_id, vec_id, cos, CAST(rnk AS INTEGER) AS rank
FROM (SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= 5
""".strip()

# ---- round-3 statistics layer (functions/stats.py) -------------------------
ORACLES["e_ks_test"] = """WITH counts AS (
    SELECT value AS v,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value
), cum AS (
    SELECT sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
           sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
    FROM counts
), tot AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM cum)
SELECT CAST(max(t.n1) AS BIGINT) AS n1, CAST(max(t.n2) AS BIGINT) AS n2,
       round(CAST(max(abs(c.cum1 * t.n2 - c.cum2 * t.n1)) AS DOUBLE)
             / (max(t.n1) * max(t.n2)), 6) AS d_stat
FROM cum c, tot t"""
ORACLES["e_mannwhitney"] = """WITH counts AS (
    SELECT value AS v,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
           sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c2
    FROM events WHERE event_type IN ('view', 'signup') GROUP BY value
), ranked AS (
    SELECT c1, c2, c1 + c2 AS t,
           sum(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             - (c1 + c2) AS before
    FROM counts
), m AS (
    SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
           sum(c1 * (before + (t + 1) / 2.0)) AS r1,
           CAST(sum(t * t * t - t) AS DOUBLE) AS tie3
    FROM ranked
)
SELECT n1, n2,
       round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
       round(n1 * n2 - (r1 - n1 * (n1 + 1) / 2.0), 6) AS u2,
       round(((r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0
                    * ((n1 + n2 + 1)
                       - tie3 / (CAST(n1 + n2 AS DOUBLE)
                                 * (n1 + n2 - 1)))), 6) AS z
FROM m"""
ORACLES["e_ab_ttest"] = """WITH m AS (
    SELECT CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
             AS n1,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
             AS n2,
           avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
           avg(CASE WHEN event_type = 'error' THEN value END) AS m2,
           var_samp(CASE WHEN event_type = 'click' THEN value END) AS s1,
           var_samp(CASE WHEN event_type = 'error' THEN value END) AS s2
    FROM events WHERE event_type IN ('click', 'error')
)
SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
       round((m1 - m2) / sqrt(s1 / n1 + s2 / n2), 6) AS t_stat,
       round((s1 / n1 + s2 / n2) * (s1 / n1 + s2 / n2)
             / ((s1 / n1) * (s1 / n1) / (n1 - 1)
                + (s2 / n2) * (s2 / n2) / (n2 - 1)), 6) AS df
FROM m"""
ORACLES["e_cusum_drift"] = """WITH daily AS MATERIALIZED (
    SELECT strftime(ts, '%Y-%m-%d') AS day, round(avg(value), 6) AS day_mean
    FROM events GROUP BY 1
), g AS (SELECT round(avg(day_mean), 6) AS gm FROM daily),
c AS (
    SELECT day, day_mean,
           round(sum(day_mean - g.gm)
                 OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 6) AS s
    FROM daily, g
)
SELECT day, day_mean, s,
       round(s - min(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 6)
         AS drawup
FROM c"""
ORACLES["e_spearman"] = """WITH pu AS MATERIALIZED (
    SELECT user_id, CAST(count(*) AS DOUBLE) AS x, round(avg(value), 6) AS y
    FROM events GROUP BY user_id
), rxc AS (SELECT x AS v, count(*) AS t FROM pu GROUP BY x),
rx AS (
    SELECT v AS x,
           sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t
             + (t + 1) / 2.0 AS rank_x
    FROM rxc
), ryc AS (SELECT y AS v, count(*) AS t FROM pu GROUP BY y),
ry AS (
    SELECT v AS y,
           sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t
             + (t + 1) / 2.0 AS rank_y
    FROM ryc
), j AS (
    SELECT rank_x, rank_y FROM pu JOIN rx USING (x) JOIN ry USING (y)
), m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(rank_x) AS sx, sum(rank_y) AS sy,
           sum(rank_x * rank_y) AS sxy,
           sum(rank_x * rank_x) AS sxx, sum(rank_y * rank_y) AS syy
    FROM j
)
SELECT n, round((n * sxy - sx * sy)
                / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS rho
FROM m"""
ORACLES["e_kaplan_meier"] = """WITH ev AS MATERIALIZED (
    SELECT user_id, CAST(ts AS DATE) AS d FROM events
), span AS (
    SELECT user_id, min(d) AS d0, max(d) AS d1 FROM ev GROUP BY user_id
), gmax AS (SELECT max(d) AS dmax FROM ev),
spans AS (
    SELECT date_diff('day', d0, d1) AS duration,
           CASE WHEN d1 <= dmax - 1 THEN 1 ELSE 0 END AS observed
    FROM span, gmax
), per_t AS (
    SELECT duration AS t, count(*) AS c, sum(observed) AS d
    FROM spans GROUP BY duration
), total AS (SELECT count(*) AS n FROM spans),
risk AS (
    SELECT t, c, d,
           (SELECT n FROM total)
             - sum(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) + c AS n_risk
    FROM per_t
), curve AS (
    SELECT t, n_risk, d,
           max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit,
           sum(CASE WHEN d < n_risk
                    THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                    ELSE 0.0 END)
             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum
    FROM risk
)
SELECT CAST(t AS INTEGER) AS t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d,
       CASE WHEN hit = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END AS s_hat
FROM curve WHERE d > 0"""
ORACLES["r_corr_matrix"] = """WITH m AS (
    SELECT count(*) AS n,
           sum(l_quantity) AS s_q, sum(l_quantity * l_quantity) AS ss_q,
           sum(l_extendedprice) AS s_e,
           sum(l_extendedprice * l_extendedprice) AS ss_e,
           sum(l_discount) AS s_d, sum(l_discount * l_discount) AS ss_d,
           sum(l_quantity * l_extendedprice) AS sp_qe,
           sum(l_quantity * l_discount) AS sp_qd,
           sum(l_extendedprice * l_discount) AS sp_ed
    FROM lineitem
)
SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col,
       CAST(n AS BIGINT) AS n,
       round((n * sp_qe - s_q * s_e)
             / sqrt((n * ss_q - s_q * s_q) * (n * ss_e - s_e * s_e)), 6)
         AS corr
FROM m
UNION ALL
SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
       round((n * sp_qd - s_q * s_d)
             / sqrt((n * ss_q - s_q * s_q) * (n * ss_d - s_d * s_d)), 6)
FROM m
UNION ALL
SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
       round((n * sp_ed - s_e * s_d)
             / sqrt((n * ss_e - s_e * s_e) * (n * ss_d - s_d * s_d)), 6)
FROM m"""
ORACLES["r_table_profile"] = """WITH m AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_k,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dst_k,
           round(min(o_orderkey), 6) AS mn_k, round(max(o_orderkey), 6) AS mx_k,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_c,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS dst_c,
           round(min(o_custkey), 6) AS mn_c, round(max(o_custkey), 6) AS mx_c,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_p,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS dst_p,
           round(min(o_totalprice), 6) AS mn_p,
           round(max(o_totalprice), 6) AS mx_p,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_s,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS dst_s,
           min(o_orderstatus) AS mn_s, max(o_orderstatus) AS mx_s,
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_r,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS dst_r,
           min(o_orderpriority) AS mn_r, max(o_orderpriority) AS mx_r,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nul_d,
           CAST(count(DISTINCT o_orderdate) AS BIGINT) AS dst_d,
           strftime(min(o_orderdate), '%Y-%m-%d') AS mn_d,
           strftime(max(o_orderdate), '%Y-%m-%d') AS mx_d
    FROM orders
)
SELECT 'o_orderkey' AS col_name, n_rows, nul_k AS n_null, dst_k AS n_distinct,
       CAST(mn_k AS DOUBLE) AS min_num, CAST(mx_k AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM m
UNION ALL
SELECT 'o_custkey', n_rows, nul_c, dst_c, CAST(mn_c AS DOUBLE),
       CAST(mx_c AS DOUBLE), NULL, NULL FROM m
UNION ALL
SELECT 'o_totalprice', n_rows, nul_p, dst_p, mn_p, mx_p, NULL, NULL FROM m
UNION ALL
SELECT 'o_orderstatus', n_rows, nul_s, dst_s, NULL, NULL, mn_s, mx_s FROM m
UNION ALL
SELECT 'o_orderpriority', n_rows, nul_r, dst_r, NULL, NULL, mn_r, mx_r FROM m
UNION ALL
SELECT 'o_orderdate', n_rows, nul_d, dst_d, NULL, NULL, mn_d, mx_d FROM m"""
ORACLES["r_assoc_rules"] = """WITH li AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
), nb AS (SELECT count(DISTINCT b) AS nb FROM li),
itemn AS MATERIALIZED (SELECT i, count(*) AS ni FROM li GROUP BY i),
freq1 AS (SELECT i FROM itemn WHERE ni >= 3),
lif AS MATERIALIZED (SELECT li.* FROM li JOIN freq1 USING (i)),
pairs AS (
    SELECT a.i AS i1, b.i AS i2, count(*) AS support
    FROM lif a JOIN lif b ON a.b = b.b AND a.i < b.i
    GROUP BY 1, 2 HAVING count(*) >= 3
), bidir AS (
    SELECT i1, i2, support FROM pairs
    UNION ALL SELECT i2, i1, support FROM pairs
)
SELECT b.i1 AS antecedent, b.i2 AS consequent,
       CAST(b.support AS BIGINT) AS support,
       round(CAST(b.support AS DOUBLE) / n1.ni, 6) AS confidence,
       round(b.support * (SELECT nb FROM nb)
             / (CAST(n1.ni AS DOUBLE) * n2.ni), 6) AS lift
FROM bidir b
JOIN itemn n1 ON n1.i = b.i1
JOIN itemn n2 ON n2.i = b.i2"""
ORACLES["r_mutual_info"] = """WITH cells AS (
    SELECT l_returnflag, l_linestatus, count(*) AS o
    FROM lineitem GROUP BY l_returnflag, l_linestatus
), rows_m AS (
    SELECT l_returnflag, sum(o) AS rn FROM cells GROUP BY l_returnflag
), cols_m AS (
    SELECT l_linestatus, sum(o) AS cn FROM cells GROUP BY l_linestatus
), tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
SELECT count(*) AS n_cells,
       max(t.n) AS n_rows,
       round(sum((c.o / CAST(t.n AS DOUBLE))
                 * ln(c.o * t.n / CAST(r.rn * cm.cn AS DOUBLE))), 6)
         AS mi_nats
FROM cells c
JOIN rows_m r USING (l_returnflag)
JOIN cols_m cm USING (l_linestatus), tot t"""
ORACLES["e_gini"] = """WITH pu AS (
    SELECT user_id, round(sum(value), 6) AS x FROM events GROUP BY user_id
), ranked AS (
    SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM pu
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(2 * sum(i * x) / (count(*) * sum(x))
             - (count(*) + 1) / CAST(count(*) AS DOUBLE), 6) AS gini
FROM ranked"""
from adopt_spark.functions.dedup import SORTED_NEIGHBORHOOD_SQL as _SN_SQL
ORACLES["t_sorted_neighborhood"] = _SN_SQL
from adopt_spark.functions.text import BIGRAM_LOGPROB_SQL as _BG_SQL
ORACLES["t_bigram_logprob"] = _BG_SQL
ORACLES["a_conductance"] = f"""WITH lab AS MATERIALIZED (
{_og.lpa_fixed_sql(SPARSE_EDGE_SQL, output="labels")}
), e2 AS MATERIALIZED (
{SPARSE_EDGE_SQL}
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS u, greatest(sid, tid) AS v
    FROM e2 WHERE sid <> tid
), tot AS (SELECT 2 * count(*) AS tot FROM und),
ej AS MATERIALIZED (
    SELECT und.u, und.v, la.label AS la, lb.label AS lb
    FROM und
    JOIN lab la ON la.v = und.u
    JOIN lab lb ON lb.v = und.v
), vol AS (
    SELECT label, count(*) AS vol FROM (
        SELECT la AS label FROM ej UNION ALL SELECT lb FROM ej
    ) GROUP BY label
), cut AS (
    SELECT label, count(*) AS cut FROM (
        SELECT la AS label FROM ej WHERE la <> lb
        UNION ALL SELECT lb FROM ej WHERE la <> lb
    ) GROUP BY label
)
SELECT v.label, CAST(v.vol AS BIGINT) AS vol,
       CAST(COALESCE(c.cut, 0) AS BIGINT) AS cut,
       round(COALESCE(c.cut, 0)
             / CAST(least(v.vol, t.tot - v.vol) AS DOUBLE), 6)
         AS conductance
FROM vol v LEFT JOIN cut c USING (label), tot t
WHERE least(v.vol, t.tot - v.vol) > 0"""
ORACLES["g_powerlaw_alpha"] = f"""WITH edge_sparse AS (
{SPARSE_EDGE_SQL}
), sym AS (
    SELECT DISTINCT v, w FROM (
        SELECT sid AS v, tid AS w FROM edge_sparse
        UNION ALL SELECT tid, sid FROM edge_sparse
    ) WHERE v <> w
), deg AS (SELECT v, count(*) AS d FROM sym GROUP BY v)
SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(max(d) AS BIGINT) AS max_degree,
       round(1.0 + count(*) / sum(ln(CAST(d AS DOUBLE))), 6) AS alpha
FROM deg"""
ORACLES["e_trigram_paths"] = """WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), tri AS (
    SELECT event_type AS e1,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), agg AS (
    SELECT e1, e2, e3, count(*) AS n FROM tri
    WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS INTEGER)
         AS rank,
       e1, e2, e3, n
FROM agg QUALIFY rank <= 20"""
ORACLES["e_dow_seasonality"] = """WITH per AS (
    SELECT dayofweek(ts) + 1 AS dow, CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS dow_mean
    FROM events GROUP BY 1
), grand AS (
    SELECT sum(dow_mean * n) / sum(n) AS gm FROM per
)
SELECT dow, n, dow_mean, round(dow_mean / gm, 6) AS seasonal_index
FROM per, grand"""
ORACLES["e_stream_outer_join"] = """WITH clicks AS MATERIALIZED (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), purchases AS MATERIALIZED (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), wm AS (
    SELECT least((SELECT max(ts) FROM clicks),
                 (SELECT max(ts) FROM purchases))
           - INTERVAL 1 HOUR AS w
), matched AS MATERIALIZED (
    SELECT c.user_id, c.event_id AS cid, p.event_id AS pid
    FROM clicks c JOIN purchases p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
), expired AS (
    SELECT c.user_id, c.event_id AS cid
    FROM clicks c, wm
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.cid = c.event_id)
      AND c.ts + INTERVAL 60 MINUTE < wm.w
), u AS (
    SELECT user_id, cid, pid FROM matched
    UNION ALL SELECT user_id, cid, NULL FROM expired
)
SELECT user_id, CAST(count(pid) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_expired
FROM u GROUP BY user_id"""
ORACLES["r_scd2_asof"] = f"""SELECT * FROM ({ORACLES["r_scd2_merge"]})
WHERE valid_from <= '{SCD2_ASOF_DATE}'
  AND (valid_to IS NULL OR valid_to > '{SCD2_ASOF_DATE}')"""
ORACLES["a_component_density"] = f"""WITH RECURSIVE edge_sparse AS (
{SPARSE_EDGE_SQL}
), sym AS (
    SELECT sid AS u, tid AS v FROM edge_sparse
    UNION SELECT tid, sid FROM edge_sparse
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), lab AS (
    SELECT v, min(r) AS component FROM reach GROUP BY v
), und AS (
    SELECT DISTINCT least(sid, tid) AS u, greatest(sid, tid) AS v
    FROM edge_sparse WHERE sid <> tid
), m AS (
    SELECT la.component, count(*) AS m
    FROM und JOIN lab la ON la.v = und.u GROUP BY la.component
), n AS (SELECT component, count(*) AS n FROM lab GROUP BY component)
SELECT n.component, CAST(n.n AS BIGINT) AS n,
       CAST(COALESCE(m.m, 0) AS BIGINT) AS m,
       round(COALESCE(m.m, 0) / (n.n * (n.n - 1) / 2.0), 6) AS density
FROM n LEFT JOIN m USING (component) WHERE n.n >= 2"""
ORACLES["t_crosslang_overlap"] = """WITH pos AS MATERIALIZED (
    SELECT lang, doc_id, i, w FROM (
        SELECT lang, doc_id, generate_subscripts(t, 1) AS i,
               unnest(t) AS w
        FROM (SELECT lang, doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents)
    ) WHERE w <> ''
), grams AS MATERIALIZED (
    SELECT DISTINCT a.lang,
           a.w || ' ' || b1.w || ' ' || b2.w || ' ' || b3.w
               || ' ' || b4.w AS s
    FROM pos a
    JOIN pos b1 ON b1.lang = a.lang AND b1.doc_id = a.doc_id
               AND b1.i = a.i + 1
    JOIN pos b2 ON b2.lang = a.lang AND b2.doc_id = a.doc_id
               AND b2.i = a.i + 2
    JOIN pos b3 ON b3.lang = a.lang AND b3.doc_id = a.doc_id
               AND b3.i = a.i + 3
    JOIN pos b4 ON b4.lang = a.lang AND b4.doc_id = a.doc_id
               AND b4.i = a.i + 4
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM grams a JOIN grams b ON b.s = a.s AND a.lang < b.lang
GROUP BY a.lang, b.lang"""
ORACLES["e_burst_detection"] = """WITH per_min AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d %H:%M') AS minute,
           count(*) AS c
    FROM events GROUP BY 1, 2
), r AS (
    SELECT event_type, minute, c,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c DESC, minute) AS rn
    FROM per_min
)
SELECT event_type, CAST(max(c) AS BIGINT) AS peak_per_min,
       max(CASE WHEN rn = 1 THEN minute END) AS peak_minute,
       CAST(count(*) AS BIGINT) AS active_minutes,
       round(sum(c) / CAST(count(*) AS DOUBLE), 6) AS mean_per_active_min
FROM r GROUP BY event_type"""
