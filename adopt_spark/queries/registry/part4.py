# registry part 4/5 — continues part3 in the same namespace
from __future__ import annotations
_RECALL_POINTS = "\nUNION ALL\n".join(
    f"""SELECT CAST({k} AS INTEGER) AS k,
       CAST(sum(CASE WHEN ra <= {k} AND re <= {k} THEN 1 ELSE 0 END)
            AS BIGINT) AS hits,
       round(sum(CASE WHEN ra <= {k} AND re <= {k} THEN 1 ELSE 0 END)
             / (3.0 * {k}), 6) AS recall
FROM j""" for k in RECALL_KS)
ORACLES["s_recall_curve"] = f"""WITH a AS MATERIALIZED (
{_og.knn_lsh_sql(k=5, bands=4)}
), e AS MATERIALIZED (
{ORACLES["s_knn_bruteforce"]}
), j AS MATERIALIZED (
    SELECT a.q_id, a.rank AS ra, e.rank AS re
    FROM a JOIN e USING (q_id, vec_id)
)
{_RECALL_POINTS}"""
ORACLES["a_eigenvector"] = _og.eigen_fixed_sql(SPARSE_EDGE_SQL)
ORACLES["e_markov_stationary"] = _og.markov_stationary_sql()
ORACLES["e_rfm_segments"] = """WITH ev AS MATERIALIZED (
    SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
), h AS (SELECT max(d) AS h FROM ev),
rfm AS (
    SELECT user_id, date_diff('day', max(d), (SELECT h FROM h)) AS r,
           count(*) AS f, round(sum(value), 6) AS m
    FROM ev GROUP BY user_id
), scored AS (
    SELECT CAST(ntile(5) OVER (ORDER BY r ASC, user_id) AS INTEGER)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS INTEGER)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY m DESC, user_id) AS INTEGER)
             AS m_score
    FROM rfm
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users
FROM scored GROUP BY 1, 2, 3"""
ORACLES["g_twohop_sizes"] = f"""WITH edge_sparse AS (
{SPARSE_EDGE_SQL}
), sym AS MATERIALIZED (
    SELECT DISTINCT u, v FROM (
        SELECT sid AS u, tid AS v FROM edge_sparse
        UNION ALL SELECT tid, sid FROM edge_sparse
    ) WHERE u <> v
), two AS (
    SELECT a.u, b.v AS w FROM sym a JOIN sym b ON b.u = a.v
    WHERE a.u <> b.v
), reach AS (
    SELECT DISTINCT u, w FROM (
        SELECT u, v AS w FROM sym UNION ALL SELECT u, w FROM two)
), sizes AS (SELECT u, count(*) AS n2 FROM reach GROUP BY u)
SELECT n2, CAST(count(*) AS BIGINT) AS n_vertices FROM sizes GROUP BY n2"""
ORACLES["t_ngram_novelty"] = """WITH pos AS MATERIALIZED (
    SELECT doc_id AS doc, i, w FROM (
        SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents)
    ) WHERE w <> ''
), sh AS MATERIALIZED (
    SELECT DISTINCT a.doc, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM pos a
    JOIN pos b ON b.doc = a.doc AND b.i = a.i + 1
    JOIN pos c ON c.doc = a.doc AND c.i = a.i + 2
), dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT doc, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM sh JOIN dfq USING (s) GROUP BY doc"""
ORACLES["a_rank_overlap"] = f"""WITH pr AS MATERIALIZED (
{_og.pagerank_fixed_sql(DERIVED_EDGE_SQL)}
), edge AS MATERIALIZED (
{DERIVED_EDGE_SQL}
), top_pr AS (SELECT v FROM pr ORDER BY rank DESC, v LIMIT 50),
top_deg AS (
    SELECT tid AS v FROM edge GROUP BY tid
    ORDER BY count(*) DESC, tid LIMIT 50
), i AS (SELECT count(*) AS n FROM top_pr JOIN top_deg USING (v))
SELECT CAST(50 AS INTEGER) AS k, CAST(i.n AS BIGINT) AS n_common,
       round(i.n / CAST(100 - i.n AS DOUBLE), 6) AS jaccard
FROM i"""
ORACLES["s_quantization_error"] = """WITH ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
), st AS (SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY i),
e AS (
    SELECT ex.x - (CASE WHEN st.hi > st.lo
        THEN st.lo + greatest(0.0, least(255.0,
                 floor((ex.x - st.lo) / (st.hi - st.lo)
                       * 255.0 + 0.5))) / 255.0 * (st.hi - st.lo)
        ELSE st.lo END) AS err
    FROM ex JOIN st USING (i)
)
SELECT CAST(count(*) AS BIGINT) AS n_values,
       round(avg(err * err) * 1e6, 6) AS mse_x1e6,
       round(max(abs(err)), 6) AS max_abs_err
FROM e"""
ORACLES["t_readability"] = """WITH per_doc AS (
    SELECT lang,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS w,
           greatest(len(regexp_split_to_array(trim(text), '[.!?]+')) - 1,
                    1) AS s,
           length(regexp_replace(trim(text), '\\s+', '', 'g')) AS c
    FROM documents WHERE length(trim(text)) > 0
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(c) / CAST(sum(w) AS DOUBLE), 6) AS mean_word_len,
       round(sum(w) / CAST(sum(s) AS DOUBLE), 6) AS mean_sentence_len,
       round(206.835 - 1.015 * (sum(w) / CAST(sum(s) AS DOUBLE))
             - 84.6 * (sum(c) / CAST(sum(w) AS DOUBLE) / 3.0), 6)
         AS flesch_proxy
FROM per_doc GROUP BY lang"""
ORACLES["e_user_concentration"] = """WITH per AS (
    SELECT user_id, count(*) AS c FROM events GROUP BY user_id
), ranked AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn FROM per
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_users FROM per
)
SELECT max(t.n_users) AS n_users, max(t.n_events) AS n_events,
       round(sum(CASE WHEN r.rn <= ceil(t.n_users / 100.0)
                      THEN r.c ELSE 0 END)
             / CAST(max(t.n_events) AS DOUBLE), 6) AS top1pct_share,
       round(sum(CASE WHEN r.rn <= ceil(t.n_users / 10.0)
                      THEN r.c ELSE 0 END)
             / CAST(max(t.n_events) AS DOUBLE), 6) AS top10pct_share
FROM ranked r, tot t"""
ORACLES["r_abc_analysis"] = """WITH rev AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev
    FROM lineitem GROUP BY l_partkey
), tot AS (SELECT sum(rev) AS tot FROM rev),
cum AS (
    SELECT rev,
           round(CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                     ROWS UNBOUNDED PRECEDING) / t.tot
                      AS DOUBLE), 6) AS cum_share
    FROM rev, tot t
)
SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
            WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS DECIMAL(18,4)) AS class_revenue
FROM cum GROUP BY 1"""
ORACLES["r_ship_lag"] = """WITH lag AS (
    SELECT o.o_orderpriority,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS lag
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(avg(lag), 6) AS mean_days,
       round(quantile_cont(lag, 0.5), 6) AS p50_days,
       round(quantile_cont(lag, 0.95), 6) AS p95_days
FROM lag GROUP BY o_orderpriority"""
ORACLES["t_dataset_split"] = f"""SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens
FROM (
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           lang,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS t
    FROM (SELECT lang, text,
                 (({SPLIT_A} * doc_id + {SPLIT_B}) % {SPLIT_M}) % 100 AS b
          FROM documents)
) GROUP BY split, lang"""
ORACLES["e_rolling_1h"] = """WITH ev AS (
    SELECT user_id, epoch_us(ts) AS t FROM events
), pe AS (
    SELECT count(*) OVER (
        PARTITION BY user_id ORDER BY t
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
    FROM ev
)
SELECT n_1h, CAST(count(*) AS BIGINT) AS n_events FROM pe GROUP BY n_1h"""
ORACLES["e_anomaly_iqr"] = """WITH q AS (
    SELECT event_type, round(quantile_cont(value, 0.25), 6) AS q1,
           round(quantile_cont(value, 0.75), 6) AS q3
    FROM events GROUP BY event_type
), f AS (
    SELECT event_type, q1, q3,
           round(q1 - 1.5 * (q3 - q1), 6) AS lo,
           round(q3 + 1.5 * (q3 - q1), 6) AS hi
    FROM q
)
SELECT e.event_type, f.q1, f.q3, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN round(e.value, 6) < f.lo
                       OR round(e.value, 6) > f.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN f USING (event_type)
GROUP BY e.event_type, f.q1, f.q3"""
ORACLES["e_attribution"] = """WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), seq AS (
    SELECT event_type,
           first_value(event_type) OVER w AS first_touch,
           lag(event_type, 1) OVER w AS prev
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
)
SELECT first_touch, prev AS last_touch, count(*) AS n_purchases
FROM seq
WHERE event_type = 'purchase' AND prev IS NOT NULL
GROUP BY first_touch, prev"""


# ---------------------------------------------------------------
# round-3 session-5: table maintenance planners, Bloom semi join,
# BM25 retrieval (functions/maintenance.py, bloomjoin.py, text.py)
# ---------------------------------------------------------------

_BM25_QUERIES = [(1, "hash join"), (2, "window agg stream"),
                 (3, "fast scan filter")]
_COMPACT_TARGET = 4096  # bytes per output bin at test scale

# round-3 session-12: spatial grid family. Points derive from
# customer keys by pure INTEGER arithmetic (both engines exact):
# ix = (7919*k) mod 10007, iy = (104729*k) mod 10007 — two coprime
# multipliers scatter keys uniformly over the 10007² grid.
_SP_MOD = 10007
_SP_RADIUS = 300       # distance-join radius (≈3k pairs at sf0.01)
_SP_CELL = 1000        # hotspot cell edge
_SP_KNN_K, _SP_KNN_CELL = 5, 250
_SP_QUERY_MOD = 101    # query side = custkey % 101 == 0


def _sp_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("long").alias("id"),
        ((F.col("c_custkey") * 7919) % _SP_MOD).cast("long").alias("ix"),
        ((F.col("c_custkey") * 104729) % _SP_MOD).cast("long").alias("iy"))


_SP_POINT_EXPRS = ("CAST(c_custkey AS BIGINT)",
                   "(c_custkey * 7919) % 10007",
                   "(c_custkey * 104729) % 10007")


def q_rgb_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RGB-PNG decode with a value-level oracle: truecolor
    payloads (every scanline filter across the fixture, 3-byte pixels
    so the bytewise bpp-offset unfilter actually runs) whose channel
    law (k*31 + i*7 + c*11) % 256 is evaluated in SQL; the decoded
    per-channel means + std must reproduce it
    (functions/multimodal.py:decode_rgb_features)."""
    from adopt_spark.functions.multimodal import (
        decode_rgb_features, synthetic_rgb_media,
    )

    media = synthetic_rgb_media(_media_keys(spark, sf_dir))
    out = decode_rgb_features(media)
    return out.select("media_id",
                      F.round("mean_r", 4).alias("mean_r"),
                      F.round("mean_g", 4).alias("mean_g"),
                      F.round("mean_b", 4).alias("mean_b"),
                      F.round("std_px", 4).alias("std_px"))


# round-3 session-15: sampling/sketch estimators with exact ride-along
_DOULION_PCT = 25
_KMV_SETOP_K = 256


def q_triangle_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION sampled triangle estimate: deterministic LCG edge gate
    at 25%, count on survivors, scale by (1/p)³; exact count rides
    along to expose the estimator error
    (algos/triangles.py:triangle_count_sampled)."""
    from adopt_spark.algos.triangles import triangle_count_sampled

    return triangle_count_sampled(derived_edges(spark, sf_dir),
                                  _DOULION_PCT)


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set operations: union / intersection / Jaccard
    estimates for {custkeys with orders} vs {custkeys in customer}
    from mergeable bottom-k sketches — the join-sizing estimator
    (functions/sketch.py:kmv_set_ops); exact counts ride along."""
    from adopt_spark.functions.sketch import kmv_set_ops

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"))
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("key"))
    return kmv_set_ops(o, c, "key", k=_KMV_SETOP_K)


# round-3 session-14: graph-partitioner planning metrics
_PQ_K = 16


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-cut / balance / vertex-replication metrics for hash,
    range, and edge-hash (vertex-cut) partitioners over the derived
    graph — the planning query behind a 100-TB layout choice
    (skew.py:partition_quality; exact LCG mixer on both engines)."""
    from adopt_spark.skew import partition_quality

    return partition_quality(derived_edges(spark, sf_dir), _PQ_K)


# round-3 session-13: regular path queries (Kleene closure — beyond
# the reference's conjunctive motifs). Regex a·b*·a over parity labels.
_RPQ_TRANS = [(0, "a", 1), (1, "b", 1), (1, "a", 2)]
_RPQ_ACCEPT = [2]
_RPQ_SEED_BOUND = 20
_RPQ_LABEL_SQL = "CASE WHEN (sid + tid) % 2 = 0 THEN 'a' ELSE 'b' END"


def q_rpq_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular path query a·b*·a over the sparse graph with parity
    edge labels: all (seed, v) pairs connected by a matching path,
    evaluated as BFS over the graph x NFA product (algos/rpq.py).
    Kleene closure is inexpressible in the reference's conjunctive
    motif language; oracle is a recursive CTE over the same product."""
    from adopt_spark.algos.rpq import rpq_pairs

    e = derived_edges_sparse(spark, sf_dir)
    led = e.select("sid", "tid", F.when(
        (F.col("sid") + F.col("tid")) % 2 == 0,
        F.lit("a")).otherwise(F.lit("b")).alias("label"))
    vs = (e.select(F.col("sid").alias("v"))
          .unionAll(e.select(F.col("tid").alias("v"))).distinct())
    seeds = vs.where(F.col("v") < _RPQ_SEED_BOUND)
    out, _ = rpq_pairs(spark, led, _RPQ_TRANS, seeds, _RPQ_ACCEPT)
    return out


def q_pregel_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component sizes computed through the GENERIC Pregel API
    (algos/pregel.py) — hash-min label adoption as a user-level
    vertex program; same oracle as a_cc_sizes, so the API's superstep
    machinery (triplet join, map-side-combined inbox, fixpoint
    fingerprint, checkpoint/resume) is value-checked end-to-end."""
    from adopt_spark.algos.pregel import pregel_cc

    e = derived_edges(spark, sf_dir)
    state, _ = pregel_cc(e).run(spark, max_iter=64)
    return (state.groupBy(F.col("label").alias("component"))
            .agg(F.count(F.lit(1)).alias("size")))


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial distance join: all customer-point pairs
    within radius 300 on the integer grid — 9 cell-key equi-joins,
    never the n² cross product; exact int64 distances. Oracle is the
    naive cross-join plan (functions/spatial.py:grid_distance_join)."""
    from adopt_spark.functions.spatial import grid_distance_join

    return grid_distance_join(_sp_points(spark, sf_dir), _SP_RADIUS)


def q_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord-style density hotspots: per occupied grid cell the
    point count, 3x3-neighborhood total (scatter + re-aggregate, no
    self-join matrix), and lift over the global occupied-cell mean
    (functions/spatial.py:hotspot_cells)."""
    from adopt_spark.functions.spatial import hotspot_cells

    return hotspot_cells(_sp_points(spark, sf_dir), _SP_CELL)


def q_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT spatial k-NN via the two-phase grid plan: 5x5-block kth
    distance bound, then a per-query density-adaptive ring search —
    equal to brute force by construction, O(points in the disk) per
    query (functions/spatial.py:spatial_knn_exact)."""
    from adopt_spark.functions.spatial import spatial_knn_exact

    pts = _sp_points(spark, sf_dir)
    qs = pts.where(F.col("id") % _SP_QUERY_MOD == 0)
    return spatial_knn_exact(pts, qs, _SP_KNN_K, _SP_KNN_CELL,
                             max_coord=_SP_MOD)


# round-3 session-11: incremental MV maintenance + manifest pruning
_MV_SPLIT = "1998-03-01"          # base/delta split date
_SKIP_LO, _SKIP_HI = "1995-01-01", "1995-03-31"
_SKIP_ROWS_PER_FILE = 1000


def q_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per
    (returnflag, linestatus) pricing view is kept as partial state
    (count/sum/min/max) and MERGED with the delta slice's state — the
    base fact rows are never re-aggregated with the delta. Oracle =
    full recompute over all of lineitem, so the monoid decomposition
    is checked value-for-value (functions/maintenance.py:mv_merge)."""
    from adopt_spark.functions.maintenance import mv_merge

    li = _t(spark, sf_dir, "lineitem")
    base = li.where(F.col("l_shipdate") < F.lit(_MV_SPLIT))
    delta = li.where(F.col("l_shipdate") >= F.lit(_MV_SPLIT))
    return mv_merge(base, delta, ["l_returnflag", "l_linestatus"],
                    "l_quantity", "l_extendedprice")


def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg manifest-pruning effectiveness: pack lineitem into
    synthetic 1000-row files per returnflag under a shipdate-clustered
    and an ingest-ordered layout, prune on per-file min/max for one
    quarter's predicate, report files read/skipped/false-positive and
    rows scanned/matched per layout — the measured value of
    clustering (functions/maintenance.py:file_skipping_stats)."""
    from adopt_spark.functions.maintenance import file_skipping_stats

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .cast("long").alias("rid"))
    return file_skipping_stats(li, "l_returnflag", "rid", "l_shipdate",
                               _SKIP_LO, _SKIP_HI,
                               rows_per_file=_SKIP_ROWS_PER_FILE)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style small-file compaction plan over the documents
    table treated as a file catalog (lang = table partition, n_chars
    = file bytes): greedy window-cumsum binpack to 4 KiB bins."""
    from adopt_spark.functions.maintenance import compaction_plan

    files = _t(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars")
    return compaction_plan(files, "lang", "doc_id", "n_chars",
                           _COMPACT_TARGET)


def q_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partition skew report for orders keyed by o_custkey into
    32 buckets (shared exact multiplicative hash, so the bucket
    assignment is engine-replicable)."""
    from adopt_spark.functions.maintenance import partition_skew

    return partition_skew(_t(spark, sf_dir, "orders"), "o_custkey", 32)


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem SEMI JOIN urgent orders through a Bloom pre-filter
    (pre-shuffle row pruning; exact join re-verifies survivors, so
    the oracle is the plain semi join), aggregated by return flag."""
    from adopt_spark.functions.bloomjoin import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    out = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
              .cast("long")).alias("price_cents"))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 documents for a fixed 3-query set (Lucene-style
    non-negative idf, exact micro-lattice score sum)."""
    from adopt_spark.functions.text import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_QUERIES, k=5)


# deterministic thinning of the derived graph: splits the one dense
# blob into several components with a bipartite/odd-cycle mix, and
# keeps the recursive-CTE oracle ~10x cheaper than the full graph.
_BIP_THIN = "(sid * 31 + tid) % 13 = 0"


def q_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component bipartiteness / odd-cycle report over the
    thinned derived graph (CC roots + multi-source parity BFS)."""
    from adopt_spark.algos.bipartite import bipartite_check

    e = derived_edges(spark, sf_dir).where(
        F.expr(f"{_BIP_THIN}"))
    return bipartite_check(spark, e)


_JOIN_SPECS_SQL = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def q_join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-join output cardinalities + hot-key share for the
    three TPC-H FK joins, computed from key-count tables without
    running the joins (the ADOPT-premise planner statistic)."""
    from adopt_spark.functions.cardinality import join_size_profile

    specs = [
        (name, _t(spark, sf_dir, lt), lk, _t(spark, sf_dir, rt), rk)
        for name, lt, lk, rt, rk in _JOIN_SPECS_SQL
    ]
    return join_size_profile(specs)


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate image pairs over the REAL PNG
    decode path: banded-LSH candidates on the 63-bit aHash of the
    decoded pixels, exact bit_count(xor) verify; the fixture's pixel
    law is closed-form so the whole decode→hash→dedup pipeline has a
    value-level SQL oracle."""
    from adopt_spark.functions.multimodal import (
        image_near_dup, synthetic_png_neardup_media,
    )

    media = synthetic_png_neardup_media(_media_keys(spark, sf_dir))
    return image_near_dup(media, max_hamming=3)


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type
    event count with the count from 7 days earlier, report per-type
    MAE / MAPE over the evaluable span — the standard QA loop run
    before trusting any fancier forecaster. Exact integer errors; the
    two summary divisions are 6 dp-rounded doubles."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("event_type"),
                        F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))
    pred = daily.select("event_type",
                        F.date_add(F.col("d"), 7).alias("d"),
                        F.col("n").alias("p"))
    j = daily.join(pred, ["event_type", "d"])
    err = F.abs(F.col("n") - F.col("p"))
    return (j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_eval"),
        F.sum(err).alias("abs_err_total"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6)
         .alias("mae"),
        F.round(F.avg(err.cast("double") / F.col("n")), 6).alias("mape")))


ORACLES_FORECAST = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
    FROM events GROUP BY 1, 2
), j AS (
    SELECT a.event_type, a.n, b.n AS p
    FROM daily a
    JOIN daily b ON b.event_type = a.event_type
                AND b.d + INTERVAL 7 DAY = a.d
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days_eval,
       CAST(sum(abs(n - p)) AS BIGINT) AS abs_err_total,
       round(CAST(sum(abs(n - p)) AS DOUBLE) / count(*), 6) AS mae,
       round(avg(CAST(abs(n - p) AS DOUBLE) / n), 6) AS mape
FROM j GROUP BY 1
""".strip()


def q_lang_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 distinctive terms per language by smoothed log-odds vs
    the rest of the corpus (Monroe et al.'s "Fightin' Words" shape
    with +1 smoothing): the corpus-drift probe that tells you WHAT a
    partition over-represents, not just that it drifts. The ranking
    statistic is ln of a ratio of exact integers, 6 dp-quantized
    before the rank; ties break on term ASC."""
    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
         .alias("term")).where(F.col("term") != "")
    per = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    lang_tot = per.groupBy("lang").agg(F.sum("c").alias("nl"))
    term_tot = per.groupBy("term").agg(F.sum("c").alias("ct"))
    tot = toks.count()
    j = per.join(lang_tot, "lang").join(term_tot, "term")
    rest_c = F.col("ct") - F.col("c")
    rest_n = F.lit(int(tot)) - F.col("nl")
    log_odds = F.round(F.log(
        ((F.col("c") + 1).cast("double") / (F.col("nl") - F.col("c") + 1))
        / ((rest_c + 1).cast("double") / (rest_n - rest_c + 1))), 6)
    w = Window.partitionBy("lang").orderBy(F.desc("log_odds"),
                                           F.asc("term"))
    return (j.select("lang", "term", log_odds.alias("log_odds"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 10)
            .select("lang", "term", "log_odds",
                    F.col("rn").cast("int").alias("rn")))


ORACLES_LANG_KEYWORDS = """
WITH toks AS (
    SELECT lang,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
    FROM documents
), t2 AS (SELECT * FROM toks WHERE term <> ''),
per AS (SELECT lang, term, count(*) AS c FROM t2 GROUP BY 1, 2),
lt AS (SELECT lang, sum(c) AS nl FROM per GROUP BY 1),
tt AS (SELECT term, sum(c) AS ct FROM per GROUP BY 1),
n AS (SELECT count(*) AS tot FROM t2),
scored AS (
    SELECT per.lang, per.term,
           round(ln(
               (CAST(per.c + 1 AS DOUBLE) / (lt.nl - per.c + 1))
               / (CAST(tt.ct - per.c + 1 AS DOUBLE)
                  / (n.tot - lt.nl - (tt.ct - per.c) + 1))), 6) AS log_odds
    FROM per JOIN lt USING (lang) JOIN tt USING (term) CROSS JOIN n
), ranked AS (
    SELECT lang, term, log_odds,
           row_number() OVER (PARTITION BY lang
                              ORDER BY log_odds DESC, term ASC) AS rn
    FROM scored
)
SELECT lang, term, log_odds, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 10
""".strip()


_DQ_SPEC = [
    ("not_null", "o_custkey"),
    ("unique", "o_orderkey"),
    ("accepted_values", "o_orderstatus", ["O", "F", "P"]),
    ("range", "o_totalprice", 0, 600000),
    ("regex", "o_orderpriority", "^[1-5]-"),
]


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint report over orders: five row-local
    constraints fused into one scan plus an FK anti-join against
    customer."""
    from adopt_spark.functions.quality_checks import dq_report

    cons = list(_DQ_SPEC) + [
        ("fk", "o_custkey", _t(spark, sf_dir, "customer"), "c_custkey")]
    return dq_report(_t(spark, sf_dir, "orders"), cons)


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-substring spans per document (ExactSubstr
    signal: stride-1 8-gram duplicates merged into maximal spans)."""
    from adopt_spark.functions.text import dup_span_stats

    return dup_span_stats(_t(spark, sf_dir, "documents"), n=8)


def q_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint report (MOSS selection,
    k=5 token grams, window w=4): density near 2/(w+1) flags normal
    text, outliers flag boilerplate (functions/code.py)."""
    from adopt_spark.functions.code import winnow_stats

    return winnow_stats(_t(spark, sf_dir, "documents"), k=5, w=4)


def q_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style clone pairs: documents sharing >= 2 winnowing
    fingerprints after a df<=50 boilerplate cap — the code-clone
    detection report (functions/code.py)."""
    from adopt_spark.functions.code import winnow_matches

    return winnow_matches(_t(spark, sf_dir, "documents"),
                          k=5, w=4, min_shared=2, max_df=50)


def q_secret_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential-pattern scan rollup over the deterministic
    synthetic code content (planted AWS keys / hex tokens /
    private-key headers keyed off doc_id — functions/code.py)."""
    from adopt_spark.functions.code import secret_scan

    return secret_scan(_t(spark, sf_dir, "documents"))


def q_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPDX license stratification by language over the synthetic
    code content (functions/code.py) — the include/exclude partition
    for license-filtered training exports."""
    from adopt_spark.functions.code import license_scan

    return license_scan(_t(spark, sf_dir, "documents"))


from adopt_spark.functions.code import (  # noqa: E402
    license_scan_sql as _license_scan_sql,
    path_rollup_sql as _path_rollup_sql,
    secret_scan_sql as _secret_scan_sql,
    winnow_matches_sql as _winnow_matches_sql,
    winnow_stats_sql as _winnow_stats_sql,
)
from adopt_spark.functions.deps import (  # noqa: E402
    semver_resolve_sql as _semver_resolve_sql,
)


def q_semver_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """npm-style semver range resolution: the deterministic synthetic
    manifest (orders) resolved against the synthetic release table
    (part) — highest satisfying version per (repo, dep, spec), NULL
    when unresolvable (functions/deps.py; full grammar: * exact ^ ~
    >= M.x)."""
    from adopt_spark.functions.deps import (
        semver_resolve, synthetic_releases, synthetic_requirements)

    return semver_resolve(
        synthetic_requirements(_t(spark, sf_dir, "orders")),
        synthetic_releases(_t(spark, sf_dir, "part")))


def _resolved_lockfile(spark: SparkSession, sf_dir: str, thin: int = 1):
    from adopt_spark.functions.deps import (
        semver_resolve, synthetic_releases, synthetic_requirements)

    return semver_resolve(
        synthetic_requirements(_t(spark, sf_dir, "orders"), thin=thin),
        synthetic_releases(_t(spark, sf_dir, "part")))


def q_dep_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dependency footprint within 3 hops on the SPARSE
    manifest (thin=13, ~5 deps/repo): per repo, how many repos it
    transitively depends on and how many depend on it (blast
    radius). Composition: semver resolve -> dep_edges (ownership
    map) -> frontier-delta k-hop closure -> two group-bys over ONE
    pair set (functions/deps.py:dep_impact)."""
    from adopt_spark.functions.deps import dep_edges, dep_impact

    return dep_impact(
        dep_edges(_resolved_lockfile(spark, sf_dir, thin=13)), max_hops=3)


def q_dep_outdated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-repo version-drift report (`npm outdated`): every
    requirement classified current / patch / minor / major behind
    the dep's latest release, or unresolved; counts rolled up per
    repo (functions/deps.py:dep_outdated). Runs on the DENSE
    manifest — drift is per-requirement, not graph-shaped."""
    from adopt_spark.functions.deps import dep_outdated, synthetic_releases

    return dep_outdated(
        _resolved_lockfile(spark, sf_dir),
        synthetic_releases(_t(spark, sf_dir, "part")))


def q_dep_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diamond version conflicts within each root repo's 3-hop
    transitive closure on the sparse manifest: packages pinned to
    >1 distinct version across the closure, with the lowest/highest
    pinned versions compared on the int64 version key
    (functions/deps.py:dep_conflicts)."""
    from adopt_spark.functions.deps import dep_conflicts

    return dep_conflicts(
        _resolved_lockfile(spark, sf_dir, thin=13), max_hops=3)


def q_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-directory recursive corpus rollup (`du` over the synthetic
    repo tree): every ancestor dir x (depth, n_files, total_chars) —
    one bounded prefix explode + one partial-aggregated shuffle
    (functions/code.py:path_rollup)."""
    from adopt_spark.functions.code import path_rollup

    return path_rollup(_t(spark, sf_dir, "documents"))


ORACLES["t_semver_resolve"] = _semver_resolve_sql()
ORACLES["t_path_rollup"] = _path_rollup_sql()

from adopt_spark.functions.deps import (  # noqa: E402
    dep_conflicts_sql as _dep_conflicts_sql,
    dep_impact_sql as _dep_impact_sql,
    dep_outdated_sql as _dep_outdated_sql,
)

ORACLES["t_dep_impact"] = _dep_impact_sql(max_hops=3, thin=13)
ORACLES["t_dep_outdated"] = _dep_outdated_sql()
ORACLES["t_dep_conflicts"] = _dep_conflicts_sql(max_hops=3, thin=13)

ORACLES["t_winnow_stats"] = _winnow_stats_sql(k=5, w=4)
ORACLES["t_winnow_matches"] = _winnow_matches_sql(
    k=5, w=4, min_shared=2, max_df=50)
ORACLES["t_secret_scan"] = _secret_scan_sql()
ORACLES["t_license_scan"] = _license_scan_sql()


from adopt_spark.functions.maintenance import (  # noqa: E402
    compaction_plan_sql as _compaction_plan_sql,
    partition_skew_sql as _partition_skew_sql,
)
from adopt_spark.functions.text import bm25_topk_sql as _bm25_sql  # noqa: E402

ORACLES["r_compaction_plan"] = _compaction_plan_sql(
    "documents", "lang", "doc_id", "n_chars", _COMPACT_TARGET)

from adopt_spark.functions.maintenance import (  # noqa: E402
    file_skipping_sql as _file_skipping_sql,
    mv_merge_oracle_sql as _mv_merge_sql,
)

from adopt_spark.functions.spatial import (  # noqa: E402
    grid_distance_join_sql as _sp_join_sql,
    hotspot_cells_sql as _sp_hot_sql,
    spatial_knn_sql as _sp_knn_sql,
)

from adopt_spark.algos.triangles import (  # noqa: E402
    triangle_count_sampled_sql as _doulion_sql,
)
from adopt_spark.functions.sketch import (  # noqa: E402
    kmv_set_ops_sql as _kmv_setop_sql,
)

ORACLES["m_rgb_features"] = """
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(o_orderkey % 23 + 8 AS BIGINT) AS w,
           CAST(o_orderkey % 17 + 8 AS BIGINT) AS h
    FROM orders WHERE o_orderkey % 100 < 2
), px AS (
    SELECT media_id, c,
           (media_id * 31 + i * 7 + c * 11) % 256 AS p
    FROM (SELECT media_id, w, h,
                 unnest(range(0, w * h)) AS i FROM m),
         (SELECT unnest(range(0, 3)) AS c)
), ch AS (
    SELECT media_id,
           avg(CASE WHEN c = 0 THEN p END) AS mean_r,
           avg(CASE WHEN c = 1 THEN p END) AS mean_g,
           avg(CASE WHEN c = 2 THEN p END) AS mean_b,
           stddev_pop(p) AS std_px
    FROM px GROUP BY media_id
)
SELECT media_id,
       CAST(round(mean_r, 4) AS DOUBLE) AS mean_r,
       CAST(round(mean_g, 4) AS DOUBLE) AS mean_g,
       CAST(round(mean_b, 4) AS DOUBLE) AS mean_b,
       CAST(round(std_px, 4) AS DOUBLE) AS std_px
FROM ch
""".strip()

ORACLES["g_triangle_sampled"] = _doulion_sql(DERIVED_EDGE_SQL, _DOULION_PCT)
ORACLES["r_kmv_set_ops"] = _kmv_setop_sql(
    "orders", "o_custkey",
    "(SELECT c_custkey FROM customer WHERE c_acctbal > 0)", "c_custkey",
    k=_KMV_SETOP_K)

from adopt_spark.skew import partition_quality_sql as _pq_sql  # noqa: E402

ORACLES["r_partition_quality"] = _pq_sql(DERIVED_EDGE_SQL, _PQ_K)

from adopt_spark.algos.rpq import rpq_pairs_sql as _rpq_sql  # noqa: E402

ORACLES["g_rpq_reach"] = _rpq_sql(
    SPARSE_EDGE_SQL, _RPQ_LABEL_SQL, f"v < {_RPQ_SEED_BOUND}",
    _RPQ_TRANS, _RPQ_ACCEPT)

ORACLES["a_pregel_cc"] = ORACLES["a_cc_sizes"]
# delta-frontier physical strategies produce byte-identical results to
# their full-shuffle twins — same value-level oracles, checked per run
ORACLES["a_cc_delta"] = ORACLES["a_cc_sizes"]
ORACLES["a_lpa_delta"] = ORACLES["a_lpa_communities"]

# -- JOB/IMDB acyclic-join workload (queries/job.py): the reference's
#    published benchmark suite class (reference imdb/skinner.schema.sql,
#    report Table 1 "JOB"); tables synthesized deterministically from
#    TPC-H base tables by engine-neutral SQL laws, so each query's
#    oracle is the identical text over DuckDB CTEs
from adopt_spark.queries.job import (  # noqa: E402
    JOB_QUERIES as _JOB_QUERIES,
    job_oracle_sql as _job_oracle_sql,
    job_query as _job_query,
)

for _jq in _JOB_QUERIES:
    ORACLES[f"r_{_jq}"] = _job_oracle_sql(_jq)
ORACLES["r_spatial_join"] = _sp_join_sql(
    "customer", *_SP_POINT_EXPRS, _SP_RADIUS)
ORACLES["r_spatial_hotspots"] = _sp_hot_sql(
    "customer", _SP_POINT_EXPRS[1], _SP_POINT_EXPRS[2], _SP_CELL)
ORACLES["s_spatial_knn"] = _sp_knn_sql(
    "customer", *_SP_POINT_EXPRS,
    f"id % {_SP_QUERY_MOD} = 0", _SP_KNN_K)

ORACLES["r_mv_merge"] = _mv_merge_sql(
    "lineitem", ["l_returnflag", "l_linestatus"],
    "l_quantity", "l_extendedprice")
ORACLES["r_file_skipping"] = _file_skipping_sql(
    "lineitem", "l_returnflag", "(l_orderkey * 8 + l_linenumber)",
    "l_shipdate", _SKIP_LO, _SKIP_HI,
    rows_per_file=_SKIP_ROWS_PER_FILE)
ORACLES["r_partition_skew"] = _partition_skew_sql("orders", "o_custkey", 32)
ORACLES["r_bloom_semijoin"] = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS price_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""".strip()
ORACLES["t_bm25_topk"] = _bm25_sql(_BM25_QUERIES, k=5)

from adopt_spark.algos.bipartite import (  # noqa: E402
    bipartite_check_sql as _bipartite_sql,
)
from adopt_spark.functions.cardinality import (  # noqa: E402
    join_size_profile_sql as _join_profile_sql,
)
from adopt_spark.functions.text import (  # noqa: E402
    dup_span_stats_sql as _dup_span_sql,
)

ORACLES["a_bipartite"] = _bipartite_sql(
    f"SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) WHERE {_BIP_THIN}")
ORACLES["r_join_size_profile"] = _join_profile_sql(_JOIN_SPECS_SQL)
ORACLES["t_dup_spans"] = _dup_span_sql(n=8)

from adopt_spark.functions.quality_checks import (  # noqa: E402
    dq_report_sql as _dq_sql,
)

ORACLES["r_dq_report"] = _dq_sql(
    "orders", list(_DQ_SPEC) + [("fk", "o_custkey", "customer", "c_custkey")])

# closed-form twin of the decode -> aHash -> banded-dedup pipeline:
# same pixel law as synthetic_png_neardup_media, same integer
# cross-multiplied threshold, same 63-bit packing; all-pairs in SQL
# (complete because max_hamming=3 < 4 bands, pigeonhole).
ORACLES["m_image_near_dup"] = """
WITH m AS (
    SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 100 < 2
), px AS (
    SELECT k, i,
           ((k % 7) * 31 + i * 7
            + CASE WHEN i % 61 = k % 61 THEN 16 ELSE 0 END) % 256 AS p,
           ((i // 16) // 2) * 8 + ((i % 16) // 2) AS j
    FROM (SELECT k, unnest(range(0, 256)) AS i FROM m)
), blk AS (
    SELECT k, j, sum(p) AS s, count(*) AS n FROM px GROUP BY 1, 2
), tot AS (
    SELECT k, sum(p) AS st, count(*) AS nt FROM px GROUP BY 1
), bits AS (
    SELECT b.k, b.j,
           CASE WHEN b.s * t.nt > t.st * b.n THEN 1 ELSE 0 END AS bit
    FROM blk b JOIN tot t USING (k)
), hashes AS (
    SELECT k, CAST(sum(CASE WHEN j < 63 AND bit = 1
                            THEN (1::BIGINT << CAST(j AS INTEGER))
                            ELSE 0 END) AS BIGINT) AS ahash
    FROM bits GROUP BY k
)
SELECT x.k AS a, y.k AS b,
       CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER) AS hamming
FROM hashes x JOIN hashes y ON x.k < y.k
WHERE bit_count(xor(x.ahash, y.ahash)) <= 3
""".strip()
ORACLES["e_forecast_backtest"] = ORACLES_FORECAST
ORACLES["t_lang_keywords"] = ORACLES_LANG_KEYWORDS


def q_uct_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count with the join-variable order LEARNED AT RUNTIME
    by the UCT episode learner (algos/uct.py) — the reference's
    namesake adaptive mechanism (ParallelUctNodeLFTJ.java), recast as
    hash-sliced distributed episodes with per-level budgets. The count
    is exact and order-independent (each slice evaluated exactly once
    by a completed episode), so the static motif SQL is its oracle."""
    from adopt_spark.algos.uct import clique_query, uct_motif_count
    total, _ = uct_motif_count(spark, derived_edges(spark, sf_dir),
                               clique_query(3), n_slices=8, seed=7)
    return spark.createDataFrame([(total,)], "n bigint")


def q_uct_4cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Increasing 4-cycle count (reference closing-alias convention)
    under the UCT-learned variable order — see q_uct_triangle."""
    from adopt_spark.algos.uct import cycle_query, uct_motif_count
    total, _ = uct_motif_count(spark, derived_edges(spark, sf_dir),
                               cycle_query(4), n_slices=8, seed=7)
    return spark.createDataFrame([(total,)], "n bigint")


def q_uct_sel_4cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed selectivity-encoding 4-cycle (per-variable upper
    bounds replicated onto every occurrence) under the UCT-learned
    variable order — the query family where order learning has real
    signal: bounded variables are the cheap ones to bind early."""
    from adopt_spark.algos.uct import selectivity_cycle_uct, uct_motif_count
    total, _ = uct_motif_count(
        spark, derived_edges(spark, sf_dir),
        selectivity_cycle_uct(4, _SEL_4CYCLE), n_slices=8, seed=7)
    return spark.createDataFrame([(total,)], "n bigint")


# Generic conjunctive patterns (motifs.pattern_sql): the reference is a
# WCOJ engine for ANY conjunctive query over edge(sid,tid), not just the
# shipped clique/cycle files — these rows prove the same generality.
# Catalyst plans the declarative multi-join; the oracle is the identical
# generated SQL in DuckDB.
q_pattern_diamond = _motif(pattern_sql(DIAMOND))
q_pattern_tailed_tri = _motif(pattern_sql(TAILED_TRIANGLE))
q_pattern_house = _motif(pattern_sql(HOUSE))
ORACLES["g_pattern_diamond"] = f"{_EDGE_CTE}\n{pattern_sql(DIAMOND)}"
ORACLES["g_pattern_tailed_tri"] = f"{_EDGE_CTE}\n{pattern_sql(TAILED_TRIANGLE)}"
ORACLES["g_pattern_house"] = f"{_EDGE_CTE}\n{pattern_sql(HOUSE)}"


def q_uct_diamond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diamond pattern (increasing 4-cycle + (v1,v3) chord) counted by
    the UCT episode learner over the GENERIC pattern constructor
    (uct.pattern_query) — order learning is not specific to the
    clique/cycle factories, exactly as the reference evaluates any
    conjunctive query dropped into graph_query/."""
    from adopt_spark.algos.uct import pattern_query, uct_motif_count
    total, _ = uct_motif_count(spark, derived_edges(spark, sf_dir),
                               pattern_query(DIAMOND), n_slices=8, seed=7)
    return spark.createDataFrame([(total,)], "n bigint")


ORACLES["g_uct_diamond"] = f"{_EDGE_CTE}\n{pattern_sql(DIAMOND)}"

ORACLES["g_uct_triangle"] = f"{_EDGE_CTE}\n{clique_sql(3)}"
ORACLES["g_uct_4cycle"] = f"{_EDGE_CTE}\n{cycle_sql(4)}"
ORACLES["g_uct_sel_4cycle"] = (
    f"{_EDGE_CTE}\n{selectivity_cycle_sql(4, bounds=_SEL_4CYCLE)}")


# round-3 session-21: symbol call graph, SemDeDup, DeepWalk harvest
_SEMDEDUP_TAU = 0.3
_COOC_WINDOW, _COOC_TOPN = 2, 50


def q_call_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-level call-graph resolution report: defs / call sites /
    distinct callers / resolved cross-document edges per symbol,
    extracted by regex from planted source text and resolved through
    ONE symbol-key equi-join (functions/callgraph.py) — the
    finer-grained companion to the module-level import edges the
    engine is built around."""
    from adopt_spark.functions.callgraph import call_graph_report

    return call_graph_report(_t(spark, sf_dir, "documents"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clusters the embedding
    space, then near-duplicate SEMANTIC copies are pruned within each
    cluster by pairwise cosine >= tau with a keep-lowest-id policy;
    per-cluster kept/dropped report
    (functions/dedup.py:semantic_dedup)."""
    from adopt_spark.functions.dedup import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"),
                          tau=_SEMDEDUP_TAU)


def q_walk_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk skip-gram pair harvest: top-50 co-occurring vertex
    pairs within a 2-step window on the deterministic LCG walks, with
    PPMI weights — the training-data step of a graph-embedding
    pipeline (algos/walks.py:walk_cooccurrence); pair fan-out happens
    inside one codegen higher-order expression, never a self-join."""
    from adopt_spark.algos.walks import walk_cooccurrence

    return walk_cooccurrence(spark, derived_edges(spark, sf_dir),
                             window=_COOC_WINDOW, topn=_COOC_TOPN)


from adopt_spark.functions.callgraph import (  # noqa: E402
    call_graph_report_sql as _callgraph_sql,
)
from adopt_spark.functions.dedup import (  # noqa: E402
    semantic_dedup_sql as _semdedup_sql,
)
from adopt_spark.algos.walks import (  # noqa: E402
    walk_cooccurrence_sql as _cooc_sql,
)

ORACLES["t_call_graph"] = _callgraph_sql()
ORACLES["s_semantic_dedup"] = _semdedup_sql(tau=_SEMDEDUP_TAU)
ORACLES["g_walk_cooccur"] = _cooc_sql(
    DERIVED_EDGE_SQL, window=_COOC_WINDOW, topn=_COOC_TOPN)


# round-3 session-22: GNN fanout sampling, symbol health
_FANOUTS, _FANOUT_SEED_MOD = (3, 2), 20


def q_fanout_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style layer-wise neighbor sampling: hop h keeps the
    fanout_h out-neighbors with the smallest deterministic mix per
    frontier vertex (functions/sampling.py:neighbor_fanout_sample) —
    the distributed minibatch-input sampler of a GNN training
    pipeline, replayable at any parallelism and in SQL."""
    from adopt_spark.functions.sampling import neighbor_fanout_sample

    return neighbor_fanout_sample(derived_edges(spark, sf_dir),
                                  _FANOUTS, _FANOUT_SEED_MOD)


def q_symbol_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-slice symbol resolution check: defs from one corpus slice
    vs call sites from another; per-symbol ok / dead / unresolved
    status (functions/callgraph.py:symbol_health)."""
    from adopt_spark.functions.callgraph import symbol_health

    return symbol_health(_t(spark, sf_dir, "documents"))


from adopt_spark.functions.sampling import (  # noqa: E402
    neighbor_fanout_sample_sql as _fanout_sql,
)
from adopt_spark.functions.callgraph import (  # noqa: E402
    symbol_health_sql as _symbol_health_sql,
)

ORACLES["g_fanout_sample"] = _fanout_sql(
    DERIVED_EDGE_SQL, _FANOUTS, _FANOUT_SEED_MOD)
ORACLES["t_symbol_health"] = _symbol_health_sql()


def q_coarsen_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilevel random-matching graph coarsening (METIS-family RM
    scheme, Karypis & Kumar '98): per level one fixed-round Luby
    matching + supervertex contraction with summed parallel-edge
    weights; per-level vertex/edge/weight summary
    (algos/coarsen.py)."""
    from adopt_spark.algos.coarsen import coarsen_graph

    return coarsen_graph(derived_edges(spark, sf_dir))


def q_multilevel_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-way edge-cut comparison: coarsest-level hash assignment
    projected back through the coarsening cascade vs direct vertex
    hash — the measured value of multilevel partitioning
    (algos/coarsen.py:multilevel_partition)."""
    from adopt_spark.algos.coarsen import multilevel_partition

    return multilevel_partition(derived_edges(spark, sf_dir), k=4)


from adopt_spark.queries.oracle_gen import (  # noqa: E402
    coarsen_sql as _coarsen_sql,
    multilevel_partition_sql as _ml_part_sql,
)

ORACLES["g_coarsen_levels"] = _coarsen_sql(DERIVED_EDGE_SQL)
ORACLES["g_multilevel_cut"] = _ml_part_sql(DERIVED_EDGE_SQL, k=4)


_N2V_LEN, _N2V_W = 6, (1, 2, 1)   # p = q = 2, weights ×2


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec second-order biased walks (Grover & Leskovec KDD'16):
    integer (return, BFS, DFS) weights, deterministic mix selection —
    the weighted pick is ONE codegen higher-order fold per step
    (algos/walks.py:node2vec_walks); equal weights degenerate to the
    uniform walks (pinned by test)."""
    from adopt_spark.algos.walks import node2vec_walks

    return node2vec_walks(spark, derived_edges(spark, sf_dir),
                          _N2V_LEN, *_N2V_W)


from adopt_spark.algos.walks import (  # noqa: E402
    node2vec_walks_sql as _n2v_sql,
)

ORACLES["g_node2vec_walks"] = _n2v_sql(DERIVED_EDGE_SQL, _N2V_LEN, *_N2V_W)


_TW_LEN = 6


def q_temporal_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTDNE time-respecting walks (Nguyen et al. WWW'18) over the
    hourly contact stream: each step uses a contact no earlier than
    the previous one, picked deterministically from the (t, v)-sorted
    future suffix (algos/walks.py:temporal_walks) — the walk corpus a
    temporal-graph embedding pipeline trains on."""
    from adopt_spark.algos.temporal import hourly_contacts
    from adopt_spark.algos.walks import temporal_walks

    return temporal_walks(spark,
                          hourly_contacts(_t(spark, sf_dir, "events")),
                          _TW_LEN)


from adopt_spark.algos.walks import (  # noqa: E402
    temporal_walks_sql as _tw_sql,
)

ORACLES["g_temporal_walks"] = _tw_sql(
    f"WITH {_og.CONTACTS_CTE_SQL} SELECT u, v, t FROM contacts", _TW_LEN)


def q_structural_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-equivalence classes (exactly identical undirected
    neighbor sets) on the sparse graph — the mirror/vendored-copy
    detection primitive for link graphs; one adjacency build + ONE
    group-by on the adjacency array
    (algos/vertex_metrics.py:structural_equiv)."""
    from adopt_spark.algos.vertex_metrics import structural_equiv

    return structural_equiv(derived_edges_sparse(spark, sf_dir))


ORACLES["g_structural_equiv"] = f"""
{_SPARSE_CTE}, lt AS (
    SELECT DISTINCT sid, tid FROM edge_sparse WHERE sid < tid
), sym AS (
    SELECT sid AS v, tid AS nbr FROM lt
    UNION ALL
    SELECT tid AS v, sid AS nbr FROM lt
), adj AS (
    SELECT v, list_sort(list(DISTINCT nbr)) AS adj FROM sym GROUP BY v
)
SELECT CAST(min(v) AS BIGINT) AS class_rep,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(len(adj) AS BIGINT) AS deg
FROM adj GROUP BY adj HAVING count(*) >= 2
""".strip()


def q_local_sparsify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Satuluri local sparsification (SIGMOD'11): keep each vertex's
    top ceil(sqrt(deg)) incident edges by endpoint-neighborhood
    Jaccard — the community-preserving pre-filter run before
    Louvain/LPA at web scale; full kept-edge list value-checked
    (algos/sparsify.py:local_sparsify)."""
    from adopt_spark.algos.sparsify import local_sparsify

    return local_sparsify(derived_edges(spark, sf_dir))


ORACLES["g_local_sparsify"] = f"""
{_EDGE_CTE}, lt AS (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), sym AS (
    SELECT sid AS v, tid AS nbr FROM lt
    UNION ALL
    SELECT tid AS v, sid AS nbr FROM lt
), deg0 AS (
    SELECT v, count(*) AS deg FROM sym GROUP BY 1
), sup AS (
    SELECT l.sid, l.tid, count(*) AS cn
    FROM lt l
    JOIN sym s1 ON s1.v = l.sid
    JOIN sym s2 ON s2.v = l.tid AND s2.nbr = s1.nbr
    GROUP BY 1, 2
), ej AS (
    SELECT l.sid, l.tid,
           round(CAST(coalesce(sup.cn, 0) AS DOUBLE)
                 / (ds.deg + dt.deg - coalesce(sup.cn, 0)), 6) AS jaccard
    FROM lt l
    LEFT JOIN sup USING (sid, tid)
    JOIN deg0 ds ON ds.v = l.sid
    JOIN deg0 dt ON dt.v = l.tid
), perv AS (
    SELECT sid AS v, tid AS nbr, jaccard FROM ej
    UNION ALL
    SELECT tid AS v, sid AS nbr, jaccard FROM ej
), ranked AS (
    SELECT v, nbr,
           row_number() OVER (PARTITION BY v
                              ORDER BY jaccard DESC, nbr ASC) AS rnk,
           count(*) OVER (PARTITION BY v) AS deg
    FROM perv
), keeps AS (
    SELECT DISTINCT least(v, nbr) AS sid, greatest(v, nbr) AS tid
    FROM ranked WHERE rnk <= ceil(sqrt(CAST(deg AS DOUBLE)))
)
SELECT k.sid, k.tid, e.jaccard
FROM keeps k JOIN ej e USING (sid, tid)
""".strip()


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank spam mass (Gyongyi et al., VLDB'04): global PageRank
    vs trust-seeded personalized PageRank (seeds = the 3 smallest
    vertex ids, the same deterministic seed law as
    a_pagerank_personal); relative spam mass = (PR - TR) / PR — the
    fraction of a vertex's rank NOT reachable from the trusted set,
    the classic web-spam / link-farm score. Full per-vertex
    (rank, trust, spam_mass) vector at PR_ITERS fixed supersteps;
    both vectors 6 dp-quantized BEFORE the ratio so the division is
    bit-identical cross-engine."""
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir)
    seeds = [
        int(r[0])
        for r in (e.select(F.col("sid").alias("v"))
                  .union(e.select(F.col("tid").alias("v")))
                  .distinct().orderBy("v").limit(3).collect())
    ]
    pr, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS)
    tr, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS,
                     reset_vertices=seeds)
    a = pr.select("v", F.round("rank", 6).alias("rank"))
    b = tr.select("v", F.round("rank", 6).alias("trust"))
    return (a.join(b, "v")
            .select("v", "rank", "trust",
                    F.round((F.col("rank") - F.col("trust"))
                            / F.col("rank"), 6).alias("spam_mass")))


ORACLES["a_spam_mass"] = f"""
SELECT a.v, a.rank, b.rank AS trust,
       round((a.rank - b.rank) / a.rank, 6) AS spam_mass
FROM (
{_og.pagerank_fixed_sql(DERIVED_EDGE_SQL)}
) a JOIN (
{_og.pagerank_fixed_sql(DERIVED_EDGE_SQL, personalized=3)}
) b USING (v)
""".strip()


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al., NeurIPS'23): score
    every document by the mean unigram log-likelihood ratio between
    the target-domain LM (docs of the lexicographically smallest
    lang) and the raw-corpus LM, keep the top 20% — the
    domain-targeted data-selection step of a pretraining pipeline
    (functions/sampling.py:dsir_sample)."""
    from adopt_spark.functions.sampling import dsir_sample

    return dsir_sample(_t(spark, sf_dir, "documents"))


ORACLES["t_dsir_sample"] = r"""
WITH toks AS (
    SELECT doc_id, lang,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
    FROM documents
), toks_f AS (
    SELECT doc_id, lang, term FROM toks WHERE term <> ''
), tgt AS (
    SELECT min(lang) AS tl FROM documents
), cf AS (
    SELECT term, count(*) AS cq,
           sum(CASE WHEN lang = (SELECT tl FROM tgt)
               THEN 1 ELSE 0 END) AS cp
    FROM toks_f GROUP BY term
), tot AS (
    SELECT sum(cq) AS nq, sum(cp) AS np, count(*) AS v FROM cf
), scored AS (
    SELECT t.doc_id, t.lang, count(*) AS n_tokens,
           round(avg(ln((c.cp + 1) / CAST(tt.np + tt.v AS DOUBLE))
                     - ln((c.cq + 1) / CAST(tt.nq + tt.v AS DOUBLE))),
                 6) AS score
    FROM toks_f t JOIN cf c USING (term), tot tt
    GROUP BY t.doc_id, t.lang
), nd AS (
    -- budget over SCORED (tokenized) docs, mirroring dsir_sample:
    -- zero-token docs are unselectable and consume no budget
    SELECT count(*) AS n_docs FROM scored
), ranked AS (
    SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scored
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, score
FROM ranked, nd WHERE rnk <= (nd.n_docs * 20 + 99) / 100
""".strip()


def q_widest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widest (max-bottleneck) paths from the min-sid source over the
    DIRECTED dense graph with contract weights — the (max, min)
    semiring on the engine's one superstep shape (SSSP = (min,+),
    BOM = (+,x)); exact BIGINT widths, fixpoint vs the unrolled
    oracle (algos/paths.py:widest_paths)."""
    from adopt_spark.algos.paths import widest_paths

    e = derived_edges(spark, sf_dir)
    src = int(e.agg(F.min("sid")).collect()[0][0])
    width, _ = widest_paths(spark, e, src, directed=True)
    return width.select("v", "width")


ORACLES["a_widest_path"] = _og.widest_path_sql(
    DERIVED_EDGE_SQL, _og.WIDEST_ROUNDS, directed=True)


_SYM_EDGE_SQL = f"""SELECT sid, tid FROM (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) WHERE sid < tid
    UNION ALL
    SELECT tid, sid FROM ({DERIVED_EDGE_SQL}) WHERE sid < tid
) t(sid, tid)"""


def q_ppr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized-PageRank sweep cut (Andersen-Chung-Lang local
    community detection): the FULL sweep curve (k, v, ppr, cut, vol,
    phi) over the ppr/deg vertex order from the min-id seed — local
    conductance minima = the seed's nested communities
    (algos/localcom.py:ppr_sweep). Cut counts telescope as
    #(min_rank<=k) - #(max_rank<=k), so the curve needs no
    prefix-x-edge materialization."""
    from adopt_spark.algos.localcom import ppr_sweep
    from adopt_spark.queries.oracle_gen import PR_ITERS

    return ppr_sweep(spark, derived_edges(spark, sf_dir), iters=PR_ITERS)


ORACLES["a_ppr_sweep"] = f"""
WITH pr AS MATERIALIZED (
{_og.pagerank_fixed_sql(_SYM_EDGE_SQL, personalized=1)}
), lt AS MATERIALIZED (
    SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) WHERE sid < tid
), degs AS MATERIALIZED (
    SELECT v, count(*) AS deg FROM (
        SELECT sid AS v FROM lt UNION ALL SELECT tid FROM lt
    ) GROUP BY v
), ranked AS MATERIALIZED (
    SELECT pr.v, pr.rank AS ppr, degs.deg,
           row_number() OVER (ORDER BY pr.rank / degs.deg DESC, pr.v ASC)
               AS k
    FROM pr JOIN degs ON degs.v = pr.v
), er AS (
    SELECT least(ru.k, rv.k) AS kmin, greatest(ru.k, rv.k) AS kmax
    FROM lt JOIN ranked ru ON ru.v = lt.sid
    JOIN ranked rv ON rv.v = lt.tid
), per_in AS (
    SELECT kmin AS k, count(*) AS n_in FROM er GROUP BY 1
), per_out AS (
    SELECT kmax AS k, count(*) AS n_out FROM er GROUP BY 1
), tot AS (
    SELECT count(*) AS n, sum(deg) AS vol_all FROM ranked
), curve AS (
    SELECT r.k, r.v, r.ppr,
           sum(r.deg) OVER w AS vol,
           sum(coalesce(pi.n_in, 0)) OVER w
               - sum(coalesce(po.n_out, 0)) OVER w AS cut
    FROM ranked r
    LEFT JOIN per_in pi USING (k)
    LEFT JOIN per_out po USING (k)
    WINDOW w AS (ORDER BY r.k ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(k AS BIGINT) AS k, v, ppr,
       CAST(cut AS BIGINT) AS cut, CAST(vol AS BIGINT) AS vol,
       round(cut / CAST(least(vol, (SELECT vol_all FROM tot) - vol)
                        AS DOUBLE), 6) AS phi
FROM curve WHERE k < (SELECT n FROM tot)
""".strip()


def _bin_sql(col: str) -> str:
    return ("CAST(" + " + ".join(
        f"CASE WHEN {col} >= {float(1 << j)} THEN 1 ELSE 0 END"
        for j in range(20)) + " AS BIGINT)")


def q_refex_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReFeX recursive role features (Henderson KDD'11): (deg, tri)
    base features, two rounds of 6 dp-quantized neighbor means,
    logarithmic binning via exact power-of-two threshold chains (no
    log() — no rounding boundary to flip cross-engine), role id =
    min vertex per 6-bin signature (algos/roles.py:refex_roles)."""
    from adopt_spark.algos.roles import refex_roles

    return refex_roles(derived_edges(spark, sf_dir))


ORACLES["g_refex_roles"] = _VM_PRELUDE + f""",
tris AS (
    SELECT e1.sid AS a, e1.tid AS b, e2.tid AS c
    FROM lt e1 JOIN lt e2 ON e2.sid = e1.sid AND e1.tid < e2.tid
    JOIN lt e3 ON e3.sid = e1.tid AND e3.tid = e2.tid
), vt AS (
    SELECT v, count(*) AS tri FROM (
        SELECT a AS v FROM tris UNION ALL
        SELECT b FROM tris UNION ALL
        SELECT c FROM tris) GROUP BY v
), f0 AS (
    SELECT deg.v, CAST(deg.deg AS DOUBLE) AS f1,
           CAST(coalesce(vt.tri, 0) AS DOUBLE) AS f2
    FROM deg LEFT JOIN vt USING (v)
), g0 AS (
    SELECT s.v, round(avg(f.f1), 6) AS g01, round(avg(f.f2), 6) AS g02
    FROM sym s JOIN f0 f ON f.v = s.nbr GROUP BY s.v
), g1 AS (
    SELECT s.v, round(avg(g.g01), 6) AS g11, round(avg(g.g02), 6) AS g12
    FROM sym s JOIN g0 g ON g.v = s.nbr GROUP BY s.v
), binned AS (
    SELECT f0.v,
           {_bin_sql('f0.f1')} AS b_deg,
           {_bin_sql('f0.f2')} AS b_tri,
           {_bin_sql('g0.g01')} AS b_nd,
           {_bin_sql('g0.g02')} AS b_nt,
           {_bin_sql('g1.g11')} AS b_nd2,
           {_bin_sql('g1.g12')} AS b_nt2
    FROM f0 JOIN g0 USING (v) JOIN g1 USING (v)
), rep AS (
    SELECT b_deg, b_tri, b_nd, b_nt, b_nd2, b_nt2, min(v) AS role
    FROM binned GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT b.v, b.b_deg, b.b_tri, b.b_nd, b.b_nt, b.b_nd2, b.b_nt2, rep.role
FROM binned b
JOIN rep USING (b_deg, b_tri, b_nd, b_nt, b_nd2, b_nt2)"""


def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED multinomial Naive Bayes language classifier (add-one
    smoothing), fit on the deterministic 80% split and evaluated on
    the held-out 20% as a confusion matrix — the engine's first
    learned-model surface, expressed entirely as Catalyst joins and
    aggregates (functions/classify.py:nb_lang_confusion; the sparse
    ln(c+1) join means scoring shuffles only the token stream, never
    a doc x vocab matrix)."""
    from adopt_spark.functions.classify import nb_lang_confusion

    return nb_lang_confusion(_t(spark, sf_dir, "documents"))


from adopt_spark.functions.classify import (  # noqa: E402
    NB_CONFUSION_SQL as _nb_sql,
)

ORACLES["t_nb_confusion"] = _nb_sql


def q_stream_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-(user, day) quota enforcement: bounded top-k
    state (the quota smallest (ts, event_id) pairs + running total
    per key — O(quota) state, late events displace correctly, no
    event-time-ordering assumption); at completion the admitted set
    equals the batch row_number() <= quota answer, which IS the
    oracle (streaming/quota.py:quota_stream)."""
    from adopt_spark.streaming.quota import quota_stream

    return quota_stream(spark, sf_dir, quota=3)


from adopt_spark.streaming.quota import (  # noqa: E402
    QUOTA_SQL_TMPL as _quota_sql,
)

ORACLES["e_stream_quota"] = _quota_sql.format(quota=3, bucket_seconds=86400)


def q_license_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive license compliance (the SBOM question): per repo,
    the union of licenses across its <= 3-hop dependency closure on
    the sparse manifest — a repo vendoring GPL/proprietary ANYWHERE
    downstream is exposed; licenses ride the same frontier-delta
    closure as dep_impact, one distinct-agg per root
    (functions/deps.py:license_exposure)."""
    from adopt_spark.functions.deps import dep_edges, license_exposure

    return license_exposure(
        dep_edges(_resolved_lockfile(spark, sf_dir, thin=13)), max_hops=3)


from adopt_spark.functions.deps import (  # noqa: E402
    license_exposure_sql as _lic_exp_sql,
)

ORACLES["t_license_exposure"] = _lic_exp_sql(max_hops=3, thin=13)


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature discretizer (relational
    QuantileDiscretizer): exact interpolated quartile cuts (6 dp)
    broadcast onto the event stream, bucket = 1 + #cuts strictly
    below, per (event_type, bucket) stats
    (functions/stats.py:quantile_bins; percentile_approx is the
    100-TB one-line swap)."""
    from adopt_spark.functions.stats import quantile_bins

    return quantile_bins(_t(spark, sf_dir, "events"), "value", k=4)


from adopt_spark.functions.stats import (  # noqa: E402
    quantile_bins_sql as _qbins_sql,
)

ORACLES["r_quantile_bins"] = _qbins_sql("value", k=4)


def q_graph_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-equivalence QUOTIENT graph (compression report):
    false-twin classes collapse to min-id representatives; one row of
    vertex/edge counts + compression ratios — what mirror collapse
    buys a topology-only algorithm on the sparse graph
    (algos/vertex_metrics.py:quotient_graph)."""
    from adopt_spark.algos.vertex_metrics import quotient_graph

    return quotient_graph(derived_edges_sparse(spark, sf_dir))


ORACLES["g_graph_compress"] = f"""
{_SPARSE_CTE}, lt AS (
    SELECT DISTINCT sid, tid FROM edge_sparse WHERE sid < tid
), sym AS (
    SELECT sid AS v, tid AS nbr FROM lt
    UNION ALL
    SELECT tid AS v, sid AS nbr FROM lt
), adj AS (
    SELECT v, list_sort(list(DISTINCT nbr)) AS adj FROM sym GROUP BY v
), rep AS (
    SELECT v, min(v) OVER (PARTITION BY adj) AS rep FROM adj
), mapped AS (
    SELECT DISTINCT least(rs.rep, rt.rep) AS qs,
                    greatest(rs.rep, rt.rep) AS qt
    FROM lt
    JOIN rep rs ON rs.v = lt.sid
    JOIN rep rt ON rt.v = lt.tid
), c AS (
    SELECT (SELECT count(*) FROM adj) AS n_vertices,
           (SELECT count(DISTINCT adj) FROM adj) AS n_classes,
           (SELECT count(*) FROM lt) AS n_edges,
           (SELECT count(*) FROM mapped) AS n_quotient_edges
)
SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(n_classes AS BIGINT) AS n_classes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_quotient_edges AS BIGINT) AS n_quotient_edges,
       round(n_classes / CAST(n_vertices AS DOUBLE), 6) AS vertex_ratio,
       round(n_quotient_edges / CAST(n_edges AS DOUBLE), 6) AS edge_ratio
FROM c
""".strip()


def q_pagerank_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted PageRank over the hourly contact stream (the
    freshness-aware ranking a web/link pipeline runs): per-pair edge
    weight = round(Σ over contact hours of 1/(1 + age), 6) with age =
    hours before the stream head — pure rational arithmetic, NO libm,
    so both engines derive identical weights; then the standard
    weighted power iteration at PR_ITERS supersteps."""
    from adopt_spark.algos.temporal import (
        decayed_contact_weights, hourly_contacts,
    )
    from adopt_spark.queries.oracle_gen import PR_ITERS

    w_edges = decayed_contact_weights(
        hourly_contacts(_t(spark, sf_dir, "events")))
    ranks, _ = pagerank(spark, w_edges, tol=0.0, max_iter=PR_ITERS,
                        weight_col="w")
    return ranks.select("v", F.round("rank", 6).alias("rank"))


_DECAY_EDGE_SQL = f"""
WITH {_og.CONTACTS_CTE_SQL}
SELECT u AS sid, v AS tid,
       round(sum(1.0 / (1 + (SELECT max(t) FROM contacts) - t)), 6) AS w
FROM contacts GROUP BY 1, 2
""".strip()

ORACLES["a_pagerank_decayed"] = _og.pagerank_fixed_sql(
    _DECAY_EDGE_SQL, weighted_inline=True)


def q_pagerank_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NORTH-STAR pipeline as one contract row: manifests ->
    semver-resolved lockfile -> ownership-mapped repo->repo dependency
    edges -> PageRank at PR_ITERS fixed supersteps — which repos the
    ecosystem leans on, ranked. Vertex ids are the numeric repo
    indices (the dep graph's natural dictionary)."""
    from adopt_spark.functions.deps import dep_edges
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = dep_edges(_resolved_lockfile(spark, sf_dir, thin=13))
    ids = e.select(
        F.regexp_extract("src", r"([0-9]+)$", 1).cast("long").alias("sid"),
        F.regexp_extract("dst", r"([0-9]+)$", 1).cast("long").alias("tid"))
    ranks, _ = pagerank(spark, ids, tol=0.0, max_iter=PR_ITERS)
    return ranks.select("v", F.round("rank", 6).alias("rank"))


from adopt_spark.functions.deps import _khop_ctes as _dep_khop_ctes  # noqa: E402

_DEP_EDGE_SQL = f"""
WITH {_dep_khop_ctes(1, 13)}
SELECT CAST(regexp_extract(src, '([0-9]+)$', 1) AS BIGINT) AS sid,
       CAST(regexp_extract(dst, '([0-9]+)$', 1) AS BIGINT) AS tid
FROM edges
""".strip()

ORACLES["a_pagerank_deps"] = _og.pagerank_fixed_sql(_DEP_EDGE_SQL)


def q_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the order baskets:
    co-occurrence counts normalized to cosine w / sqrt(pop_u * pop_v)
    (the classic item-CF similarity), top-3 recommendations per item
    by (cosine 6dp desc, neighbor asc). The pair stage is the bounded
    bipartite_project self-join (mega-baskets capped), popularity is
    one hash agg, the top-k a per-item window."""
    from pyspark.sql import Window

    from adopt_spark.edges import bipartite_project

    li = _t(spark, sf_dir, "lineitem")
    pairs = bipartite_project(li, "l_orderkey", "l_partkey",
                              min_weight=2)
    pop = (li.select("l_orderkey", F.col("l_partkey").alias("item"))
           .distinct()
           .groupBy("item").agg(F.count(F.lit(1)).alias("pop")))
    both = (pairs.unionByName(
        pairs.select(F.col("tid").alias("sid"), F.col("sid").alias("tid"),
                     "weight")))
    sim = (both
           .join(pop.select(F.col("item").alias("sid"),
                            F.col("pop").alias("ps")), "sid")
           .join(pop.select(F.col("item").alias("tid"),
                            F.col("pop").alias("pt")), "tid")
           .select(F.col("sid").alias("item"),
                   F.col("tid").alias("rec"),
                   F.round(F.col("weight")
                           / F.sqrt(F.col("ps") * F.col("pt")), 6)
                   .alias("cosine")))
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), F.asc("rec"))
    return (sim.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("item", "rec", "cosine",
                    F.col("rnk").cast("long").alias("rnk")))


ORACLES["r_item_recs"] = """
WITH g AS (
    SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS item
    FROM lineitem
), pairs AS (
    SELECT a.item AS sid, b.item AS tid, count(*) AS weight
    FROM g a JOIN g b ON a.o = b.o AND a.item < b.item
    GROUP BY 1, 2
    HAVING count(*) >= 2
), sym2 AS (
    SELECT sid, tid, weight FROM pairs
    UNION ALL
    SELECT tid, sid, weight FROM pairs
), pop AS (
    SELECT item, count(*) AS pop FROM g GROUP BY 1
), sim AS (
    SELECT b.sid AS item, b.tid AS rec,
           round(b.weight / sqrt(ps.pop * pt.pop), 6) AS cosine
    FROM sym2 b
    JOIN pop ps ON ps.item = b.sid
    JOIN pop pt ON pt.item = b.tid
)
SELECT item, rec, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY item
                                 ORDER BY cosine DESC, rec ASC) AS rnk
    FROM sim
) WHERE rnk <= 3
""".strip()


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point by binary segmentation: per event_type the
    day split maximizing the between-segment variance reduction over
    the daily-mean series — the hindsight break finder beside
    e_cusum_drift's sequential watcher
    (functions/stats.py:changepoint_binary; daily means 6 dp-quantized
    at the stage boundary so both engines' prefix sums add identical
    values in identical order)."""
    from adopt_spark.functions.stats import changepoint_binary

    return changepoint_binary(_t(spark, sf_dir, "events"))


from adopt_spark.functions.stats import (  # noqa: E402
    CHANGEPOINT_SQL as _chg_sql,
)

ORACLES["e_changepoint"] = _chg_sql


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: the trained 8-merge BPE
    applied corpus-wide, rolled up to per-lang chars/token and
    tokens/word — the number a tokenizer sweep optimizes (a lang
    whose fertility is high is under-served by the learned merges).
    Composes the oracle-green trainer + encoder; one extra join +
    group-by."""
    from adopt_spark.functions.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    enc = bpe_encode(docs, bpe_train(docs, n_merges=8))
    return (enc.join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words"),
                 F.sum("n_chars").cast("long").alias("n_chars"),
                 F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
                 F.round(F.sum("n_chars")
                         / F.sum("n_bpe_tokens"), 6).alias("chars_per_token"),
                 F.round(F.sum("n_bpe_tokens")
                         / F.sum("n_words"), 6).alias("tokens_per_word")))


from adopt_spark.functions.bpe import bpe_encode_sql as _bpe_enc_sql  # noqa: E402

ORACLES["t_bpe_fertility"] = f"""
WITH enc AS (
{_bpe_enc_sql(8)}
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(e.n_words) AS BIGINT) AS n_words,
       CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
       CAST(sum(e.n_bpe_tokens) AS BIGINT) AS n_tokens,
       round(sum(e.n_chars) / CAST(sum(e.n_bpe_tokens) AS DOUBLE), 6)
           AS chars_per_token,
       round(sum(e.n_bpe_tokens) / CAST(sum(e.n_words) AS DOUBLE), 6)
           AS tokens_per_word
FROM enc e JOIN documents d USING (doc_id)
GROUP BY d.lang
""".strip()


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas merge_asof
    tolerance): each click matched to the user's latest view at or
    before it, but views older than 1 hour are NO match — the guard
    against joining last week's quote onto today's trade. Epoch-µs
    numeric key so the bound is exact integer arithmetic
    (functions/interval.py:asof_join(tolerance=...))."""
    from adopt_spark.functions.interval import asof_join

    e = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    clicks = e.where(F.col("event_type") == "click") \
              .select("event_id", "user_id", "ts_us")
    views = (e.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts_us")
             .agg(F.max("event_id").alias("view_id")))
    out = asof_join(clicks, views, on="ts_us", by=["user_id"],
                    right_cols=["view_id"], prefix="prev_",
                    tolerance=3_600_000_000)
    return out.select("event_id", "user_id", "ts_us", "prev_view_id")


ORACLES["e_asof_tolerance"] = """
WITH clicks AS (
    SELECT event_id, user_id,
           CAST(floor(epoch_us(ts)) AS BIGINT) AS ts_us
    FROM events WHERE event_type = 'click'
), views AS (
    SELECT user_id, CAST(floor(epoch_us(ts)) AS BIGINT) AS ts_us,
           max(event_id) AS view_id
    FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts_us,
       CASE WHEN c.ts_us - v.ts_us <= 3600000000
            THEN v.view_id END AS prev_view_id
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
""".strip()


def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of the daily value series per
    event_type: trend = centered 7-day moving average (full windows
    only), seasonal = per-(type, day%7) mean of the detrended series,
    residual = the rest. The anomaly-hunting decomposition beside
    e_dow_seasonality's raw profile; daily means 6 dp-quantized at
    the stage boundary, windows add identical values in identical
    order on both engines; season index is day%7 (a pure phase
    index — no calendar semantics needed for the decomposition)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(86_400_000_000)).cast("long")
    daily = (e.groupBy("event_type", day.alias("day"))
             .agg(F.round(F.avg("value"), 6).alias("m")))
    w7 = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3))
    trended = (daily
               .withColumn("nw", F.count(F.lit(1)).over(w7))
               .withColumn("trend", F.round(F.avg("m").over(w7), 6))
               .where(F.col("nw") == 7))
    seas = (trended
            .withColumn("dow", F.col("day") % 7)
            .groupBy("event_type", "dow")
            .agg(F.round(F.avg(F.col("m") - F.col("trend")), 6)
                 .alias("seasonal")))
    return (trended.withColumn("dow", F.col("day") % 7)
            .join(seas, ["event_type", "dow"])
            .select("event_type", "day", "m", "trend", "seasonal",
                    F.round(F.col("m") - F.col("trend")
                            - F.col("seasonal"), 6).alias("resid")))


ORACLES["e_stl_decompose"] = """
WITH daily AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
           round(avg(value), 6) AS m
    FROM events GROUP BY 1, 2
), trended AS (
    SELECT * FROM (
        SELECT event_type, day, m,
               count(*) OVER w AS nw,
               round(avg(m) OVER w, 6) AS trend
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ) WHERE nw = 7
), seas AS (
    SELECT event_type, day % 7 AS dow,
           round(avg(m - trend), 6) AS seasonal
    FROM trended GROUP BY 1, 2
)
SELECT t.event_type, t.day, t.m, t.trend, s.seasonal,
       round(t.m - t.trend - s.seasonal, 6) AS resid
FROM trended t JOIN seas s
  ON s.event_type = t.event_type AND s.dow = t.day % 7
""".strip()


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row DATASET CARD (the datasheet a corpus release ships):
    docs, langs, whitespace tokens, exact-dup rate on normalized
    text, mean quality, median tokens/doc — six pipeline stages
    recomposed into one wide report row, so stage-interaction bugs
    fail even when each stage is individually green (the
    t_pipeline_e2e pattern, report-shaped)."""
    from adopt_spark.functions.text import quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    return (d.select(
        "lang", token_count("text").alias("nt"),
        F.round(quality_score("text"), 4).alias("q"),
        norm.alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.countDistinct("lang").cast("long").alias("n_langs"),
             F.sum("nt").cast("long").alias("total_tokens"),
             F.round(F.lit(1) - F.countDistinct("k")
                     / F.count(F.lit(1)), 6).alias("dup_rate"),
             F.round(F.avg("q"), 6).alias("mean_quality"),
             F.round(F.expr("percentile(nt, 0.5)"), 6)
             .alias("median_tokens")))


ORACLES["t_dataset_card"] = f"""
WITH d AS (
    SELECT lang,
           {_TOKENS_SQL} AS nt,
           {_QUALITY_SQL} AS q,
           regexp_replace(trim(text), '\\s+', ' ', 'g') AS k
    FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(1 - count(DISTINCT k) / CAST(count(*) AS DOUBLE), 6)
           AS dup_rate,
       round(avg(q), 6) AS mean_quality,
       round(quantile_cont(nt, 0.5), 6) AS median_tokens
FROM d
""".strip()


def q_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-failure percolation curve at p = 30/60/90% kept edges
    (deterministic DOULION coin): components + largest-component size
    per level — the Albert-Barabási complement of the targeted
    a_hub_robustness probe. Bounded to ids < 600 so the oracle's
    three recursive closures stay cheap; the Spark side has no such
    limit at scale (algos/cc.py:percolation_profile)."""
    from adopt_spark.algos.cc import percolation_profile

    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < 600) & (F.col("tid") < 600))
    return percolation_profile(spark, e, ps=(30, 60, 90))


def _perc_level_sql(p: int) -> str:
    from adopt_spark.algos.triangles import DOULION_A, DOULION_B, DOULION_M

    return f"""
WITH RECURSIVE edge AS (
SELECT sid, tid FROM ({DERIVED_EDGE_SQL}) WHERE sid < 600 AND tid < 600
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), samp AS MATERIALIZED (
    SELECT a, b FROM und
    WHERE ((a * {DOULION_A} + b * {DOULION_B}) % {DOULION_M}) % 100 < {p}
), sym AS MATERIALIZED (
    SELECT a AS u, b AS v FROM samp UNION SELECT b, a FROM samp
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), comp AS (
    SELECT v, min(r) AS component FROM reach GROUP BY v
), sizes AS (
    SELECT component, count(*) AS n FROM comp GROUP BY component
)
SELECT CAST({p} AS BIGINT) AS p_pct,
       (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM comp) AS n_vertices,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(coalesce(max(n), 0) AS BIGINT) AS largest
FROM sizes
""".strip()


ORACLES["a_percolation"] = "\nUNION ALL\n".join(
    f"SELECT * FROM ({_perc_level_sql(p)})" for p in (30, 60, 90))


_IDCG5 = sum(1.0 / math.log2(i + 1) for i in range(1, 6))


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the LSH ANN beyond recall:
    per-query NDCG@5 (binary relevance = membership in the exact
    brute-force top-5, positions from the LSH ranking) and MRR
    (reciprocal LSH rank of the true #1). Both ranked lists are this
    engine's own oracle-checked operators; the oracle joins their two
    SQL twins and replays the same DCG arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(emb)
    exact = brute_force_topk(emb, q, k=5).select(
        "q_id", "vec_id", F.col("rank").alias("e_rank"))
    approx = lsh_topk(emb, q, k=5, bits=12, bands=4).select(
        "q_id", "vec_id", F.col("rank").alias("a_rank"))
    hits = approx.join(exact, ["q_id", "vec_id"])
    per = (hits.groupBy("q_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.lit(1.0) / F.log2(F.col("a_rank") + 1))
                .alias("dcg"),
                F.max(F.when(F.col("e_rank") == 1,
                             F.lit(1.0) / F.col("a_rank"))
                      .otherwise(0.0)).alias("rr")))
    return (approx.select("q_id").distinct()
            .join(per, "q_id", "left")
            .select("q_id",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n_hits"),
                    F.round(F.coalesce("dcg", F.lit(0.0))
                            / F.lit(_IDCG5), 6).alias("ndcg"),
                    F.round(F.coalesce("rr", F.lit(0.0)), 6).alias("rr")))


ORACLES["s_retrieval_eval"] = f"""
WITH a AS (
    SELECT q_id, vec_id, rank AS a_rank
    FROM ({_og.knn_lsh_sql(k=5, bands=4)})
), e AS (
    SELECT q_id, vec_id, rank AS e_rank
    FROM ({ORACLES["s_knn_bruteforce"]})
), h AS (
    SELECT a.q_id, a.a_rank, e.e_rank
    FROM a JOIN e USING (q_id, vec_id)
), per AS (
    SELECT q_id, count(*) AS n,
           sum(1.0 / log2(a_rank + 1)) AS dcg,
           max(CASE WHEN e_rank = 1 THEN 1.0 / a_rank ELSE 0 END) AS rr
    FROM h GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_hits,
       round(coalesce(per.dcg, 0) / {_IDCG5!r}, 6) AS ndcg,
       round(coalesce(per.rr, 0), 6) AS rr
FROM (SELECT DISTINCT q_id FROM a) q
LEFT JOIN per USING (q_id)
""".strip()


_TFIDF_SIM_MAX_DF = 60
_TFIDF_SIM_MIN_COS = 0.3


def q_tfidf_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine document-similarity join — the IR-side
    sibling of the dense ANN and the Jaccard dedup: tf·idf weights
    (6 dp-quantized BEFORE the dot product), boilerplate terms with
    df > {max_df} dropped (the prefix-filter-style fan-out cap: a
    term's candidate contribution is df², so the cap bounds the join
    exactly like winnowing's max_df), candidate pairs from ONE term
    equi-join, cosine ≥ {min_cos} emitted. At 100 TB this is the
    standard sparse similarity self-join: term-keyed, never
    doc × doc."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
         .alias("term")).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = _t(spark, sf_dir, "documents").count()
    kept = (tf.join(df_.where(F.col("df") <= _TFIDF_SIM_MAX_DF), "term")
            .select("doc_id", "term",
                    F.round(F.col("tf")
                            * F.log(F.lit(float(n_docs)) / F.col("df")),
                            6).alias("w")))
    norms = kept.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = kept.select(F.col("doc_id").alias("da"), "term",
                    F.col("w").alias("wa"))
    b = kept.select(F.col("doc_id").alias("db"), "term",
                    F.col("w").alias("wb"))
    dots = (a.join(b, "term").where(F.col("da") < F.col("db"))
            .groupBy("da", "db")
            .agg(F.count(F.lit(1)).alias("n_shared"),
                 F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    out = (dots
           .join(norms.select(F.col("doc_id").alias("da"),
                              F.col("nrm").alias("na")), "da")
           .join(norms.select(F.col("doc_id").alias("db"),
                              F.col("nrm").alias("nb")), "db")
           .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                   F.col("n_shared").cast("long").alias("n_shared"),
                   F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                   .alias("cosine")))
    return out.where(F.col("cosine") >= _TFIDF_SIM_MIN_COS)


ORACLES["t_tfidf_sim"] = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
), toks_f AS (
    SELECT doc_id, term FROM toks WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks_f GROUP BY 1, 2
), dfq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), nd AS (
    SELECT count(*) AS n FROM documents
), kept AS (
    SELECT tf.doc_id, tf.term,
           round(tf.tf * ln((SELECT n FROM nd) / CAST(dfq.df AS DOUBLE)),
                 6) AS w
    FROM tf JOIN dfq USING (term)
    WHERE dfq.df <= {_TFIDF_SIM_MAX_DF}
), norms AS (
    SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM kept GROUP BY 1
), dots AS (
    SELECT a.doc_id AS da, b.doc_id AS db,
           count(*) AS n_shared, sum(a.w * b.w) AS dot
    FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d.da AS doc_a, d.db AS doc_b,
       CAST(d.n_shared AS BIGINT) AS n_shared,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.da
JOIN norms nb ON nb.doc_id = d.db
WHERE round(d.dot / (na.nrm * nb.nrm), 6) >= {_TFIDF_SIM_MIN_COS}
""".strip()


def q_markov_absorb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probabilities of the event-type Markov chain: the
    lexicographically largest state declared absorbing (its row
    overridden to 1 every step), p_t(s) = P(hit absorber within t
    steps) after MARKOV_ITERS supersteps — the 'probability a
    session ends in purchase' analysis beside e_markov_stationary's
    long-run profile. Same restricted/renormalized chain, monotone
    recurrence (oracle_gen.markov_absorb_sql)."""
    from adopt_spark.queries.oracle_gen import MARKOV_ITERS

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(w).alias("dst"))
             .where(F.col("dst").isNotNull())
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    states = pairs.select(F.col("src").alias("state")).distinct()
    rp = pairs.join(states.withColumnRenamed("state", "dst"), "dst",
                    "left_semi")
    tot = rp.groupBy("src").agg(F.sum("n").alias("tot"))
    trans = (rp.join(tot, "src")
             .select("src", "dst", F.col("n").cast("double").alias("n"),
                     F.col("tot").cast("double").alias("tot"))
             .localCheckpoint(eager=True))
    absorber = states.agg(F.max("state")).collect()[0][0]
    p = states.select(
        "state",
        F.when(F.col("state") == absorber, 1.0).otherwise(0.0).alias("p"))
    for _ in range(MARKOV_ITERS):
        hit = (trans.join(p, p["state"] == trans["dst"])
               .groupBy(F.col("src").alias("_s"))
               .agg(F.sum(F.col("n") / F.col("tot") * F.col("p"))
                    .alias("hp")))
        p = (states.join(hit, states["state"] == hit["_s"], "left")
             .select("state",
                     F.when(F.col("state") == absorber, 1.0)
                     .otherwise(F.coalesce("hp", F.lit(0.0))).alias("p")))
    return p.select("state", F.round("p", 6).alias("p_absorb"))


ORACLES["e_markov_absorb"] = _og.markov_absorb_sql()


def q_weighted_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locally-dominant WEIGHTED matching (Preis/Manne-Bisseling
    1/2-approx of maximum weight matching) with contract weights —
    the weighted generalization of a_matching, unique by the
    (weight desc, a, b) tie order on both engines
    (algos/matching.py:weighted_matching)."""
    from adopt_spark.algos.matching import weighted_matching

    return weighted_matching(derived_edges(spark, sf_dir))
