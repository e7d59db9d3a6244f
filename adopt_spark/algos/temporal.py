"""Temporal (time-respecting) reachability over a contact stream.

Batch temporal-graph analytics: given timestamped contacts (u, v, t),
vertex b is reachable from vertex a iff there is a path whose contact
times are non-decreasing — information can only flow forward in time
(Holme & Saramäki, Temporal Networks, Phys. Rep. 519, 2012). The
static-graph reachability over the same edges OVERCOUNTS: a path
u →(t=5) w →(t=3) v is a static path but not a temporal one.

Earliest-arrival relaxation (the temporal BFS): with seed s,

    arr_0(s) = 0,  arr_0(v ≠ s) = +∞
    arr_{i+1}(v) = min(arr_i(v), min { t : (u,v,t) ∈ C, t ≥ arr_i(u) })

is monotone non-increasing and converges within (#vertices − 1)
rounds; each round is one join (contacts against the current arrival
frontier) + one min-aggregate — the same superstep shape as
algos/paths.py, so it distributes identically: contacts are keyed by
u for the frontier join and by v for the aggregate, hub skew lands in
map-side partial min-aggregation. Fixed-round unrolling in SQL
(oracle_gen.temporal_reach_sql) is exact because rounds past the
fixpoint are no-ops.

Contact construction here (the contract query's deterministic input):
two users are in contact at hour h iff both emitted an event of the
SAME event_type within hour h — a (bucket, type)-keyed self-join, so
candidate volume is Σ_bucket B², bounded by the busiest hour, never
|users|². At 100-TB event volume the bucket key (hour, type) is the
partition key and a per-bucket user cap (same pattern as
edges.bipartite_project's basket cap) bounds any pathological bucket;
the fixture's busiest bucket holds 10 users.

Reference parity: the reference engine has no temporal operators;
this extends the events-stream suite (SURVEY §2.9 "beyond ref").
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

TEMPORAL_ROUNDS = 8


def hourly_contacts(events: DataFrame) -> DataFrame:
    """Symmetric contact list [u: long, v: long, t: long] — t is the
    epoch hour; one row per (u, v, hour) with u ≠ v, both directions."""
    occ = (events.select(
        F.col("user_id").cast("long").alias("u"),
        # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the
        # cast matches DuckDB's epoch() on the naive timestamp
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                 / F.lit(3_600_000_000)))
        .cast("long").alias("t"),
        "event_type").distinct())
    other = occ.select(F.col("u").alias("v"), "t", "event_type")
    return (occ.join(other, ["t", "event_type"])
            .where(F.col("u") != F.col("v"))
            .select("u", "v", "t").distinct())


def temporal_reachability(
    spark: SparkSession,
    contacts: DataFrame,
    seed: int,
    rounds: int = TEMPORAL_ROUNDS,
) -> tuple[DataFrame, list[dict]]:
    """Earliest-arrival table [v: long, arrival: long] for every vertex
    temporally reachable from ``seed`` (arrival = epoch hour of the
    first time-respecting path; 0 for the seed itself)."""
    c = contacts.select(F.col("u").cast("long"), F.col("v").cast("long"),
                        F.col("t").cast("long")).localCheckpoint(eager=True)
    arr = spark.createDataFrame([(int(seed), 0)], "v long, arrival long")
    arr = arr.localCheckpoint(eager=True)
    metrics: list[dict] = []
    for it in range(rounds):
        t0 = time.time()
        relaxed = (c.join(arr.select(F.col("v").alias("u"),
                                     F.col("arrival").alias("au")), "u")
                   .where(F.col("t") >= F.col("au"))
                   .select("v", F.col("t").alias("arrival")))
        new_arr = (arr.unionByName(relaxed)
                   .groupBy("v").agg(F.min("arrival").alias("arrival")))
        new_arr = new_arr.localCheckpoint(eager=True)
        changed = int(
            new_arr.join(arr.withColumnRenamed("arrival", "old"),
                         "v", "left")
            .where(F.col("old").isNull()
                   | (F.col("arrival") != F.col("old"))).count())
        arr = new_arr
        metrics.append({"iteration": it, "changed": changed,
                        "sec": round(time.time() - t0, 4)})
        if changed == 0:
            break
    return arr, metrics


def temporal_reach_report(spark: SparkSession, events: DataFrame,
                          rounds: int = TEMPORAL_ROUNDS) -> DataFrame:
    """Contract shape: earliest arrival per reached user from the
    minimum user id, [v: long, arrival: long]."""
    contacts = hourly_contacts(events)
    seed = events.agg(F.min("user_id")).collect()[0][0]
    arr, _ = temporal_reachability(spark, contacts, int(seed),
                                   rounds=rounds)
    return arr.select(F.col("v").cast("long"),
                      F.col("arrival").cast("long"))


TRIANGLE_DELTAS = (24, 72)


def temporal_triangles(spark: SparkSession, contacts: DataFrame,
                       deltas: tuple[int, ...] = TRIANGLE_DELTAS,
                       ) -> DataFrame:
    """δ-temporal triangle census (the Paranjape-Benson-Leskovec
    WSDM'17 motif family, hour resolution): ordered contact triples
    (u,v,t1), (v,w,t2), (w,u,t3) with t1 < t2 < t3 and t3 − t1 ≤ δ.
    For an undirected triangle with three DISTINCT edge times there is
    exactly one such triple (the middle edge fixes v), so the count is
    the number of time-respecting triangles; same-hour edges never
    count (strict <).

    Plan: two equi-joins on the shared vertex with the time predicates
    as join residuals, then one span histogram scanned once per δ —
    the wedge volume is the temporal 2-path count, keyed by the
    center vertex, so hub skew goes to AQE skew-join handling exactly
    like the static wedge plan in algos/triangles.py. Returns
    [delta: int, n_triangles: long].
    """
    c = contacts.select(F.col("u").cast("long"), F.col("v").cast("long"),
                        F.col("t").cast("long")).localCheckpoint(eager=True)
    c1 = c.select(F.col("u").alias("a"), F.col("v").alias("b"),
                  F.col("t").alias("t1"))
    c2 = c.select(F.col("u").alias("b"), F.col("v").alias("cv"),
                  F.col("t").alias("t2"))
    max_d = max(deltas)
    wedge = (c1.join(c2, "b")
             .where((F.col("t2") > F.col("t1"))
                    & (F.col("cv") != F.col("a"))
                    & (F.col("t2") - F.col("t1") <= max_d)))
    c3 = c.select(F.col("u").alias("cv"), F.col("v").alias("a"),
                  F.col("t").alias("t3"))
    tri = (wedge.join(c3, ["cv", "a"])
           .where((F.col("t3") > F.col("t2"))
                  & (F.col("t3") - F.col("t1") <= max_d))
           .select((F.col("t3") - F.col("t1")).alias("span")))
    spans = tri.groupBy("span").agg(F.count(F.lit(1)).alias("n"))
    dl = spark.createDataFrame([(int(d),) for d in deltas], "delta int")
    return (spans.crossJoin(F.broadcast(dl))
            .where(F.col("span") <= F.col("delta"))
            .groupBy("delta")
            .agg(F.sum("n").alias("n_triangles"))
            .unionByName(  # deltas with zero triangles still get a row
                dl.join(spans.crossJoin(F.broadcast(dl))
                        .where(F.col("span") <= F.col("delta"))
                        .select("delta").distinct(),
                        "delta", "left_anti")
                .select("delta", F.lit(0).cast("long")
                        .alias("n_triangles"))))


def decayed_contact_weights(contacts: DataFrame) -> DataFrame:
    """Recency-weighted edge table from the contact stream:
    (sid, tid, w) with w = round(Σ over contact hours of
    1 / (1 + age), 6), age = hours before the stream head (max t).

    Hyperbolic decay instead of exponential ON PURPOSE: 1/(1+age) is
    pure rational arithmetic — no libm call, so both engines derive
    bit-identical per-term values and the 6 dp quantization only has
    to absorb summation order. Feed to pagerank(weight_col='w') for
    freshness-aware ranking.
    """
    tmax = contacts.agg(F.max("t").alias("tmax"))
    return (contacts.crossJoin(F.broadcast(tmax))
            .groupBy(F.col("u").alias("sid"), F.col("v").alias("tid"))
            .agg(F.round(F.sum(
                F.lit(1.0) / (1 + F.col("tmax") - F.col("t"))), 6)
                .alias("w")))
