"""Regular path queries: label-constrained reachability.

An RPQ asks for vertex pairs (s, v) connected by a path whose edge-
label sequence matches a regular expression — the core recursive
primitive of graph query languages (SPARQL property paths, Cypher
``[:A|:B*]``, GQL path patterns). The engine evaluates an RPQ as a
BFS over the PRODUCT of the graph with the regex's finite automaton:
a frontier of (seed, vertex, automaton-state) triples is extended
each superstep by one equi-join against the labeled edge set and one
broadcast join against the (tiny) transition table, de-duplicated
against the visited set (anti-join), until no new product states
appear. Kleene stars terminate because the product space is finite —
|V| x |Q| per seed — and the visited set is monotone.

Scale shape: per superstep one shuffle join on the frontier's vertex
column + one broadcast join (the automaton is a handful of rows) +
one anti-join; the visited set is the only growing state, bounded by
|seeds| x |V| x |Q| and localCheckpoint'd every round so the
iterative plan stays flat. Skewed hub vertices are ordinary skewed
join keys (AQE applies). No reference counterpart: the reference's
conjunctive motif queries cannot express Kleene closure at all —
this is strictly-beyond-reference query surface.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def rpq_pairs(
    spark: SparkSession,
    edges: DataFrame,
    transitions: list[tuple[int, str, int]],
    seeds: DataFrame,
    accept_states: list[int],
    start_state: int = 0,
    max_iter: int = 50,
) -> tuple[DataFrame, list[dict]]:
    """All (s, v) with a path s→v whose labels match the automaton.

    ``edges``: (sid, tid, label:string). ``transitions``: NFA edges
    (q, label, q') — nondeterminism is free (the product BFS carries
    every live state). ``seeds``: one column of start vertices. A
    seed matches itself iff ``start_state`` is accepting (the empty
    path). Returns (DataFrame[s, v] distinct, per-superstep metrics).
    """
    if not transitions:
        raise ValueError("transitions must be non-empty")
    trans = spark.createDataFrame(
        [(int(q), str(l), int(q2)) for q, l, q2 in transitions],
        "tq int, tl string, tq2 int")

    e = edges.select(F.col("sid").cast("long"),
                     F.col("tid").cast("long"),
                     F.col("label").cast("string")).persist()
    e.count()

    frontier = seeds.select(
        F.col(seeds.columns[0]).cast("long").alias("s")).distinct() \
        .select("s", F.col("s").alias("v"),
                F.lit(start_state).cast("int").alias("q"))
    visited = frontier.localCheckpoint(eager=True)
    frontier = visited

    metrics: list[dict] = []
    for it in range(max_iter):
        t0 = time.time()
        step = (frontier.join(e, frontier["v"] == e["sid"])
                .join(F.broadcast(trans),
                      (F.col("q") == F.col("tq"))
                      & (F.col("label") == F.col("tl")))
                .select("s", F.col("tid").alias("v"),
                        F.col("tq2").alias("q"))
                .distinct())
        new = step.join(visited, ["s", "v", "q"], "left_anti") \
                  .localCheckpoint(eager=True)
        n_new = new.count()
        metrics.append({"iteration": it, "new_states": n_new,
                        "sec": round(time.time() - t0, 4)})
        if n_new == 0:
            break
        visited = visited.unionAll(new).localCheckpoint(eager=True)
        frontier = new

    e.unpersist()
    acc = [int(a) for a in accept_states]
    out = (visited.where(F.col("q").isin(acc))
           .select("s", "v").distinct())
    return out, metrics


def rpq_pairs_sql(edge_cte: str, label_expr: str, seed_pred: str,
                  transitions: list[tuple[int, str, int]],
                  accept_states: list[int],
                  start_state: int = 0) -> str:
    """DuckDB twin: recursive CTE over the same product graph.

    ``edge_cte``: SQL producing (sid, tid); ``label_expr``: label as
    a SQL expression over sid/tid; ``seed_pred``: predicate over the
    vertex column ``v`` choosing seeds.
    """
    tvals = ", ".join(f"({q}, '{l}', {q2})" for q, l, q2 in transitions)
    accs = ", ".join(str(int(a)) for a in accept_states)
    return f"""
WITH RECURSIVE edge AS (
{edge_cte}
), led AS (
    SELECT sid, tid, {label_expr} AS label FROM edge
), vs AS (
    SELECT DISTINCT sid AS v FROM edge
    UNION SELECT DISTINCT tid FROM edge
), seeds AS (
    SELECT v AS s FROM vs WHERE {seed_pred}
), trans(tq, tl, tq2) AS (
    SELECT * FROM (VALUES {tvals})
), reach(s, v, q) AS (
    SELECT s, s, {int(start_state)} FROM seeds
    UNION
    SELECT r.s, e.tid, t.tq2
    FROM reach r
    JOIN led e ON e.sid = r.v
    JOIN trans t ON t.tq = r.q AND t.tl = e.label
)
SELECT DISTINCT CAST(s AS BIGINT) AS s, CAST(v AS BIGINT) AS v
FROM reach WHERE q IN ({accs})
""".strip()
