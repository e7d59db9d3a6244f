"""Bipartiteness test / odd-cycle detection, per component.

A graph (component) is bipartite iff a BFS 2-coloring has no edge
joining two vertices of the same color — equivalently, no odd cycle.
The distributed plan composes two primitives this repo already has:

  1. connected components (large-star/small-star hash-min, algos/cc.py)
     give each vertex its component label = the component's minimum
     vertex id, which doubles as a canonical BFS root;
  2. multi-source BFS (algos/paths.py with a DataFrame seed set — one
     frontier schedule colors EVERY component simultaneously; hop
     parity is the 2-coloring).

A conflict edge is an undirected edge whose endpoints have equal hop
parity; a component is bipartite iff it has none. Parity-BFS is sound
regardless of which root the coloring grew from, so the per-component
min-id root makes the output deterministic without mattering for
correctness.

Scale shape: CC is the usual O(log d) star-contraction rounds; the
BFS moves only frontier-sized rows per round against the one
hash-partitioned, sorted, cached edge layout; the conflict check is
two vertex-keyed equi-joins of the edge relation against the
(vertex-sized) parity vector. Nothing driver-side.

Reference parity: odd-cycle detection is the n-cycle family's
decision-problem sibling (ADOPT's cycle queries COUNT them —
graph_query/*_cycle.sql); the oracle is a bounded recursive-CTE BFS,
the same machinery as the a_cc_sizes reachability oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.paths import shortest_paths


def bipartite_check(spark: SparkSession, edges: DataFrame,
                    max_iter: int = 64) -> DataFrame:
    """-> DataFrame[component, n_vertices, is_bipartite,
    n_conflict_edges], one row per connected component.

    ``edges`` carries (sid, tid); direction is ignored (symmetrized).
    Self-loops are dropped, matching connected_components' vertex
    universe (a vertex appearing ONLY in self-loops is absent from
    the report) — the convention every algo in this repo shares.
    """
    labels, _ = connected_components(spark, edges)

    roots = labels.select(F.col("component")).distinct()
    dist, _ = shortest_paths(spark, edges, roots, weighted=False,
                             directed=False, max_iter=max_iter)
    par = dist.select("v", F.pmod(F.col("dist"), F.lit(2)).alias("p"))

    und = (edges.select(
        F.least(F.col("sid"), F.col("tid")).cast("long").alias("a"),
        F.greatest(F.col("sid"), F.col("tid")).cast("long").alias("b"))
        .where(F.col("a") != F.col("b")).distinct())
    conflicts = (und
                 .join(par.select(F.col("v").alias("a"),
                                  F.col("p").alias("pa")), "a")
                 .join(par.select(F.col("v").alias("b"),
                                  F.col("p").alias("pb")), "b")
                 .where(F.col("pa") == F.col("pb"))
                 .select("a", "b"))
    conf_per_comp = (conflicts
                     .join(labels.select(F.col("v").alias("a"), "component"),
                           "a")
                     .groupBy("component")
                     .agg(F.count(F.lit(1)).alias("n_conflict_edges")))
    verts = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_vertices"))
    nc = F.coalesce(F.col("n_conflict_edges"), F.lit(0)).cast("long")
    return (verts.join(conf_per_comp, "component", "left")
            .select("component", "n_vertices",
                    (nc == 0).alias("is_bipartite"),
                    nc.alias("n_conflict_edges")))


def bipartite_check_sql(edge_sql: str, max_depth: int = 64) -> str:
    """DuckDB twin: recursive min-label CC + bounded recursive BFS
    from each component's min-id root, then the same parity test.
    ``edge_sql`` must select (sid, tid)."""
    return f"""
WITH RECURSIVE edge AS (
{edge_sql}
), sym AS (
    SELECT sid AS u, tid AS v FROM edge WHERE sid <> tid
    UNION SELECT tid, sid FROM edge WHERE sid <> tid
), verts AS (
    SELECT DISTINCT u AS v FROM sym
), reach(v, r) AS (
    SELECT v, v FROM verts
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), comp AS (
    SELECT v, min(r) AS component FROM reach GROUP BY v
), bfs(v, d) AS (
    SELECT DISTINCT component, 0 FROM comp
    UNION
    SELECT s.v, b.d + 1 FROM bfs b JOIN sym s ON s.u = b.v
    WHERE b.d < {int(max_depth)}
), dist AS (
    SELECT v, min(d) AS d FROM bfs GROUP BY v
), und AS (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), conflicts AS (
    SELECT u.a FROM und u
    JOIN dist da ON da.v = u.a
    JOIN dist db ON db.v = u.b
    WHERE da.d % 2 = db.d % 2
), confc AS (
    SELECT c.component, count(*) AS n_conflict_edges
    FROM conflicts f JOIN comp c ON c.v = f.a
    GROUP BY 1
)
SELECT g.component,
       CAST(count(*) AS BIGINT) AS n_vertices,
       coalesce(x.n_conflict_edges, 0) = 0 AS is_bipartite,
       CAST(coalesce(x.n_conflict_edges, 0) AS BIGINT) AS n_conflict_edges
FROM comp g LEFT JOIN confc x USING (component)
GROUP BY g.component, x.n_conflict_edges
""".strip()
