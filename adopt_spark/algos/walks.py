"""Deterministic random-walk corpus generation.

Random walks are the standard precursor to graph embeddings
(DeepWalk / node2vec feed walk "sentences" into word2vec); at
100 TB the walk corpus is itself a big dataset, so generation must
be distributed and restart-safe. Here the "randomness" is a
deterministic integer mix of (walk_id, step, current-vertex) — the
same shared-hash trick the KMV/LSH oracles use — which buys three
properties a seeded RNG cannot give in a distributed setting:

  * parallelism-independence: the walk taken from vertex v does not
    depend on partitioning, task retries, or scheduling;
  * resumability: any step can be recomputed from its state alone;
  * oracle-checkability: DuckDB replays the exact walks with a
    row_number index over the same sorted adjacency.

Per step, every active walk advances to
  next = sorted_out_neighbors(cur)[ mix(walk_id, step, cur) % outdeg ]
and a walk ends early at a vertex with no out-edges (inner join drops
it — the truncating-walk convention).

Spark plan: the sorted-adjacency layout (one groupBy(src) shuffle,
arrays O(sqrt E) under orientation or raw out-degree here) is built
once and cached; each step is one equi-join of the vertex-sized
walker state against it plus an element_at — no Python, no RNG, no
collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

# Mix constants: Knuth multiplicative + two 32-bit primes, mod the
# Mersenne prime 2^31-1. Exact in BIGINT for vertex ids < ~2^31 and
# identical in Spark pmod / DuckDB % (nonnegative operands).
MIX_A1 = 2_654_435_761
MIX_A2 = 40_503
MIX_A3 = 2_246_822_519
MIX_B = 104_729
MIX_M = 2_147_483_647

MIX_SQL = (f"({MIX_A1} * walk_id + {MIX_A2} * {{step}} + {MIX_A3} * cur "
           f"+ {MIX_B}) % {MIX_M}")


def _mix(walk_id: Column, step: int, cur: Column) -> Column:
    return F.pmod(F.lit(MIX_A1) * walk_id + F.lit(MIX_A2 * step)
                  + F.lit(MIX_A3) * cur + F.lit(MIX_B), F.lit(MIX_M))


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """One deterministic walk per source vertex; returns
    DataFrame[walk_id, step, v] with step 0 = the start vertex and
    walks truncated at dangling vertices.
    """
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"]))
    adj = (e.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("adj"),
                F.count(F.lit(1)).alias("deg"))
           .repartition(parts, "src")
           .persist(StorageLevel.MEMORY_AND_DISK))
    adj.count()

    state = e.select(F.col("src").alias("walk_id")).distinct() \
             .select("walk_id", F.col("walk_id").alias("cur"))
    outputs = [state.select("walk_id", F.lit(0).alias("step"),
                            F.col("cur").alias("v"))]
    for step in range(1, length + 1):
        nxt = (
            state.join(adj.withColumnRenamed("src", "cur"), "cur")
            .select(
                "walk_id",
                F.element_at(
                    F.col("adj"),
                    (F.pmod(_mix(F.col("walk_id"), step, F.col("cur")),
                            F.col("deg")) + F.lit(1)).cast("int")
                ).alias("cur"),
            )
        )
        state = nxt.localCheckpoint(eager=True)
        outputs.append(state.select("walk_id", F.lit(step).alias("step"),
                                    F.col("cur").alias("v")))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionAll(o)
    adj.unpersist()
    return out


def random_walks_sql(edge_sql: str, length: int = 8) -> str:
    """DuckDB twin: replays the identical walks via a row_number
    index over the same sorted adjacency."""
    steps = []
    for i in range(1, length + 1):
        mix = MIX_SQL.format(step=i)
        steps.append(f"""w{i} AS MATERIALIZED (
    SELECT w.walk_id, a.tid AS cur
    FROM w{i-1} w JOIN adj a
      ON a.sid = w.cur AND a.idx = ({mix}) % a.deg
)""")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT walk_id, {i} AS step, cur AS v FROM w{i}"
        for i in range(0, length + 1))
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), adj AS MATERIALIZED (
    SELECT sid, tid,
           row_number() OVER (PARTITION BY sid ORDER BY tid) - 1 AS idx,
           count(*) OVER (PARTITION BY sid) AS deg
    FROM (SELECT DISTINCT sid, tid FROM edge WHERE sid <> tid)
), w0 AS MATERIALIZED (
    SELECT DISTINCT sid AS walk_id, sid AS cur FROM adj
), {', '.join(steps)}
SELECT walk_id, CAST(step AS INTEGER) AS step, v FROM (
    {sel}
)"""


# --------------------------------------- DeepWalk co-occurrence/PPMI
#
# DeepWalk / node2vec (Perozzi KDD'14, Grover KDD'16) train skip-gram
# embeddings on (center, context) pairs harvested from random walks
# within a window. The pair-harvest + PPMI weighting is the
# training-DATA step a 100-TB graph-embedding pipeline runs on Spark;
# the SGD itself belongs to the ML stack. Walks are the deterministic
# LCG walks above, so the harvest is replayable at any parallelism
# and exactly replicable in SQL.


def walk_cooccurrence(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    window: int = 2,
    topn: int = 50,
) -> DataFrame:
    """Top-N skip-gram pairs (u <= v canonical) by co-occurrence count
    within ``window`` steps on the same walk, with PPMI weights.

    Plan shape: walks (|V| rows per step, iterative equi-joins) →
    ONE groupBy packs each walk into a bounded array (length+1 ≤ 9
    elements) → pair fan-out happens INSIDE a whole-stage-codegen
    higher-order expression (≤ length·window pairs per walk, no
    self-join, no shuffle of the fan-out) → one partial-aggregated
    count. PPMI marginals come from the counts frame itself (two
    metadata-scale aggregates), never a second corpus pass.
    """
    walks = random_walks(spark, edges, length)
    seqs = (walks.groupBy("walk_id")
            .agg(F.array_sort(F.collect_list(F.struct("step", "v")))
                 .alias("sv"))
            .select(F.transform("sv", lambda s: s["v"]).alias("seq")))

    n = F.size("seq")
    pair_expr = F.flatten(F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.transform(
            F.sequence(i + 1, F.least(i + window, n)),
            lambda j: F.struct(
                F.least(F.element_at(F.col("seq"), i),
                        F.element_at(F.col("seq"), j)).alias("u"),
                F.greatest(F.element_at(F.col("seq"), i),
                           F.element_at(F.col("seq"), j)).alias("v")))))
    pairs = (seqs.where(n >= 2)
             .select(F.explode(pair_expr).alias("p"))
             .select("p.u", "p.v"))

    counts = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("n_cooc"))
    total = counts.agg(F.sum("n_cooc").alias("t"))
    marg = (counts.select(F.col("u").alias("x"), "n_cooc")
            .unionAll(counts.select(F.col("v").alias("x"), "n_cooc"))
            .groupBy("x").agg(F.sum("n_cooc").alias("m")))

    scored = (counts
              .join(F.broadcast(marg.withColumnRenamed("x", "u")
                                .withColumnRenamed("m", "mu")), "u")
              .join(F.broadcast(marg.withColumnRenamed("x", "v")
                                .withColumnRenamed("m", "mv")), "v")
              .crossJoin(F.broadcast(total))
              .select(
                  "u", "v", "n_cooc",
                  F.round(
                      F.greatest(
                          F.lit(0.0),
                          F.log(F.col("n_cooc") * F.lit(4.0)
                                * F.col("t")
                                / (F.col("mu") * F.col("mv")))),
                      6).alias("ppmi")))
    return scored.orderBy(F.desc("n_cooc"), "u", "v").limit(topn)


def walk_cooccurrence_sql(edge_sql: str, length: int = 8,
                          window: int = 2, topn: int = 50) -> str:
    """DuckDB twin over the identical replayed walks."""
    walks = random_walks_sql(edge_sql, length)
    return f"""
WITH walks AS MATERIALIZED (
{walks}
), pr AS (
    SELECT least(a.v, b.v) AS u, greatest(a.v, b.v) AS v
    FROM walks a JOIN walks b
      ON a.walk_id = b.walk_id
     AND b.step > a.step AND b.step <= a.step + {window}
), counts AS MATERIALIZED (
    SELECT u, v, count(*) AS n_cooc FROM pr GROUP BY u, v
), tot AS (
    SELECT CAST(sum(n_cooc) AS DOUBLE) AS t FROM counts
), marg AS (
    SELECT x, CAST(sum(n_cooc) AS DOUBLE) AS m FROM (
        SELECT u AS x, n_cooc FROM counts
        UNION ALL SELECT v AS x, n_cooc FROM counts
    ) GROUP BY x
)
SELECT c.u, c.v, c.n_cooc,
       round(greatest(0.0, ln(c.n_cooc * 4.0 * tot.t
                              / (mu.m * mv.m))), 6) AS ppmi
FROM counts c, tot
JOIN marg mu ON mu.x = c.u
JOIN marg mv ON mv.x = c.v
ORDER BY c.n_cooc DESC, c.u, c.v
LIMIT {topn}
""".strip()


# ------------------------------------------- node2vec biased walks
#
# node2vec (Grover & Leskovec, KDD'16) biases the walk's next-step
# distribution by where the PREVIOUS vertex sits: return weight 1/p
# for stepping back to prev, 1 for a neighbor of prev (BFS-ish), 1/q
# for a distance-2 move (DFS-ish). Here the weights are INTEGERS
# (wp, w1, wq — e.g. (1, 2, 1) ≙ p = q = 2) and the choice is the
# same deterministic mix law as the uniform walks: with per-neighbor
# weights w_i over the sorted adjacency and T = Σw_i,
#
#   r = mix(walk_id, step, cur) mod T
#   next = the neighbor at cumulative-weight position r
#
# — so with wp = w1 = wq the walk IS the uniform walk (pinned by
# test), and any engine can replay the sequence exactly. The weighted
# pick runs entirely inside ONE codegen higher-order fold per step
# (zip_with + aggregate carrying a (cum, sel) struct): no Python, no
# extra shuffle beyond the two adjacency joins (cur and prev).


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    wp: int = 1,
    w1: int = 2,
    wq: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """One deterministic second-order biased walk per source vertex;
    DataFrame[walk_id, step, v], truncating at dangling vertices.
    Step 1 is uniform (no prev yet), steps >= 2 are (wp, w1, wq)-
    biased by the previous vertex."""
    if min(wp, w1, wq) < 1:
        raise ValueError(f"weights must be positive ints: {(wp, w1, wq)}")
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"]))
    adj = (e.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("adj"),
                F.count(F.lit(1)).alias("deg"))
           .repartition(parts, "src")
           .persist(StorageLevel.MEMORY_AND_DISK))
    adj.count()

    state = (adj.select(F.col("src").alias("walk_id"))
             .select("walk_id", F.lit(None).cast("long").alias("prev"),
                     F.col("walk_id").alias("cur")))
    outputs = [state.select("walk_id", F.lit(0).alias("step"),
                            F.col("cur").alias("v"))]
    for step in range(1, length + 1):
        st = (state.join(adj.select(F.col("src").alias("cur"),
                                    F.col("adj").alias("nbrs"),
                                    "deg"), "cur")
              .join(adj.select(F.col("src").alias("prev"),
                               F.col("adj").alias("prev_nbrs")),
                    "prev", "left"))
        if step == 1:
            nxt_col = F.element_at(
                F.col("nbrs"),
                (F.pmod(_mix(F.col("walk_id"), step, F.col("cur")),
                        F.col("deg")) + F.lit(1)).cast("int"))
        else:
            pn = F.coalesce(F.col("prev_nbrs"),
                            F.array().cast("array<long>"))
            w = F.transform(
                F.col("nbrs"),
                lambda x: F.when(x == F.col("prev"), F.lit(wp))
                           .when(F.array_contains(pn, x), F.lit(w1))
                           .otherwise(F.lit(wq)).cast("long"))
            total = F.aggregate(w, F.lit(0).cast("long"),
                                lambda a, x: a + x)
            r = F.pmod(_mix(F.col("walk_id"), step, F.col("cur")), total)
            nxt_col = F.aggregate(
                F.zip_with(F.col("nbrs"), w,
                           lambda x, wt: F.struct(x.alias("x"),
                                                  wt.alias("wt"))),
                F.struct(F.lit(0).cast("long").alias("cum"),
                         F.lit(None).cast("long").alias("sel")),
                lambda acc, el: F.struct(
                    (acc["cum"] + el["wt"]).alias("cum"),
                    F.when(acc["sel"].isNull()
                           & (acc["cum"] + el["wt"] > r), el["x"])
                     .otherwise(acc["sel"]).alias("sel")),
                lambda acc: acc["sel"])
        nxt = st.select("walk_id", F.col("cur").alias("prev"),
                        nxt_col.alias("cur"))
        state = nxt.localCheckpoint(eager=True)
        outputs.append(state.select("walk_id", F.lit(step).alias("step"),
                                    F.col("cur").alias("v")))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionAll(o)
    adj.unpersist()
    return out


def node2vec_walks_sql(edge_sql: str, length: int = 8,
                       wp: int = 1, w1: int = 2, wq: int = 1) -> str:
    """DuckDB twin: per step, per-neighbor CASE weights over the
    sorted adjacency, window cumulative sum, and the first neighbor
    whose running total exceeds r = mix % total."""
    steps = []
    for i in range(1, length + 1):
        mix = MIX_SQL.format(step=i)
        if i == 1:
            steps.append(f"""w1 AS MATERIALIZED (
    SELECT w.walk_id, CAST(NULL AS BIGINT) AS prev_unused,
           w.cur AS prev, a.tid AS cur
    FROM w0 w JOIN adj a
      ON a.sid = w.cur AND a.idx = ({mix}) % a.deg
)""")
            continue
        steps.append(f"""c{i} AS MATERIALIZED (
    SELECT w.walk_id, w.cur, a.tid, a.idx,
           CASE WHEN a.tid = w.prev THEN {wp}
                WHEN EXISTS (SELECT 1 FROM adj p
                             WHERE p.sid = w.prev AND p.tid = a.tid)
                    THEN {w1}
                ELSE {wq} END AS wt
    FROM w{i-1} w JOIN adj a ON a.sid = w.cur
), r{i} AS MATERIALIZED (
    SELECT walk_id, cur, tid, idx,
           sum(wt) OVER (PARTITION BY walk_id
                         ORDER BY idx ROWS UNBOUNDED PRECEDING) AS cum,
           sum(wt) OVER (PARTITION BY walk_id) AS tot
    FROM c{i}
), w{i} AS MATERIALIZED (
    SELECT walk_id, prev, cur FROM (
        SELECT r.walk_id, r.cur AS prev, r.tid AS cur,
               row_number() OVER (PARTITION BY r.walk_id
                                  ORDER BY r.idx) AS rn
        FROM r{i} r
        WHERE r.cum > ({MIX_SQL.format(step=i).replace("cur", "r.cur")}) % r.tot
    ) WHERE rn = 1
)""")
    sel = "\n    UNION ALL\n    ".join(
        ["SELECT walk_id, 0 AS step, cur AS v FROM w0"]
        + [f"SELECT walk_id, {i} AS step, cur AS v FROM w{i}"
           for i in range(1, length + 1)])
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), adj AS MATERIALIZED (
    SELECT sid, tid,
           row_number() OVER (PARTITION BY sid ORDER BY tid) - 1 AS idx,
           count(*) OVER (PARTITION BY sid) AS deg
    FROM (SELECT DISTINCT sid, tid FROM edge WHERE sid <> tid)
), w0 AS MATERIALIZED (
    SELECT DISTINCT sid AS walk_id, sid AS cur FROM adj
), {', '.join(steps)}
SELECT walk_id, CAST(step AS INTEGER) AS step, v FROM (
    {sel}
)"""


# ------------------------------------------- temporal (CTDNE) walks
#
# Continuous-time dynamic network embeddings (Nguyen et al., WWW'18
# "CTDNE") train on TIME-RESPECTING walks: each step must use a
# contact no earlier than the one that led here, so the walk follows
# information flow (Holme & Saramäki temporal paths — the same law
# temporal_reachability enforces). Deterministic edition: per vertex
# a (t, v)-sorted contact adjacency; at state (cur, tcur) the
# candidates are the sorted suffix with t >= tcur and the mix law
# picks one — replayable at any parallelism, exactly replicable in
# SQL. The suffix filter + pick run inside codegen higher-order
# expressions; each step is ONE adjacency equi-join.


def temporal_walks(
    spark: SparkSession,
    contacts: DataFrame,
    length: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """One deterministic time-respecting walk per contact source
    vertex over DataFrame[u, v, t]; returns
    DataFrame[walk_id, step, v, t] with step 0 = (start, its earliest
    contact time) and truncation when no future contact exists."""
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    c = (contacts.select(F.col("u").cast("long").alias("u"),
                         F.col("v").cast("long").alias("v"),
                         F.col("t").cast("long").alias("t"))
         .where(F.col("u") != F.col("v"))
         .dropDuplicates(["u", "v", "t"]))
    adj = (c.groupBy("u")
           .agg(F.array_sort(F.collect_list(F.struct("t", "v")))
                .alias("ctc"),
                F.min("t").alias("t0"))
           .repartition(parts, "u")
           .persist(StorageLevel.MEMORY_AND_DISK))
    adj.count()

    state = adj.select(F.col("u").alias("walk_id"),
                       F.col("u").alias("cur"),
                       F.col("t0").alias("tcur"))
    outputs = [state.select("walk_id", F.lit(0).alias("step"),
                            F.col("cur").alias("v"),
                            F.col("tcur").alias("t"))]
    for step in range(1, length + 1):
        st = state.join(adj.select(F.col("u").alias("cur"), "ctc"), "cur")
        cand = F.filter(F.col("ctc"), lambda s: s["t"] >= F.col("tcur"))
        n = F.size(cand)
        pick = F.element_at(
            cand,
            (F.pmod(_mix(F.col("walk_id"), step, F.col("cur")), n)
             + F.lit(1)).cast("int"))
        nxt = (st.where(n > 0)
               .select("walk_id",
                       pick["v"].alias("cur"),
                       pick["t"].alias("tcur")))
        state = nxt.localCheckpoint(eager=True)
        outputs.append(state.select("walk_id", F.lit(step).alias("step"),
                                    F.col("cur").alias("v"),
                                    F.col("tcur").alias("t")))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionAll(o)
    adj.unpersist()
    return out


def temporal_walks_sql(contact_sql: str, length: int = 6) -> str:
    """DuckDB twin: (t, v)-ordered adjacency with index, per step the
    future-suffix re-ranked and the mix pick replayed."""
    steps = []
    for i in range(1, length + 1):
        mix = MIX_SQL.format(step=i).replace("cur", "w.cur")
        steps.append(f"""c{i} AS MATERIALIZED (
    SELECT w.walk_id, w.cur, a.t, a.v,
           row_number() OVER (PARTITION BY w.walk_id
                              ORDER BY a.t, a.v) AS rn,
           count(*) OVER (PARTITION BY w.walk_id) AS cnt
    FROM w{i-1} w JOIN adj a
      ON a.u = w.cur AND a.t >= w.tcur
), w{i} AS MATERIALIZED (
    SELECT c.walk_id, c.v AS cur, c.t AS tcur
    FROM c{i} c
    WHERE c.rn - 1 = ({MIX_SQL.format(step=i).replace("cur", "c.cur")}) % c.cnt
)""")
    sel = "\n    UNION ALL\n    ".join(
        ["SELECT walk_id, 0 AS step, cur AS v, tcur AS t FROM w0"]
        + [f"SELECT walk_id, {i} AS step, cur AS v, tcur AS t FROM w{i}"
           for i in range(1, length + 1)])
    return f"""WITH contact AS MATERIALIZED (
{contact_sql}
), adj AS MATERIALIZED (
    SELECT DISTINCT u, v, t FROM contact WHERE u <> v
), w0 AS MATERIALIZED (
    SELECT u AS walk_id, u AS cur, min(t) AS tcur FROM adj GROUP BY u
), {', '.join(steps)}
SELECT walk_id, CAST(step AS INTEGER) AS step, v, t FROM (
    {sel}
)"""
