"""Multilevel bill-of-materials explosion — weighted transitive
closure on the (+, x) semiring.

The classic recursive manufacturing query (and the dependency-graph
twin of "how many copies of package X does my build pull in,
transitively"): given an acyclic (assembly, component, qty) table,
compute for every root the TOTAL quantity of every transitive part —
the sum over all assembly paths of the product of edge quantities —
plus the path count.

Plan shape (the cycle-DP / pair-aggregation trick, algos/cycles.py):
each level is one equi-join of the AGGREGATED (root, part, qty, paths)
frame against the component table followed by a (root, part) partial
aggregate — path multiplicity collapses every level because sums
distribute over products, so the frame shuffled per level is bounded
by reachable PAIRS, never by path count (a 20-deep BOM with fan-out 3
has ~3^20 paths; this plan never materializes them). Early-stops when
a level drains; acyclicity makes termination certain. At 100 TB each
level is one bounded-key shuffle — the same scaling argument as the
n-cycle kernel.

Reference parity note: jxiw/ADOPT has no recursive surface; this is a
beyond-reference relational operator like the interval joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bom_explode(components: DataFrame, max_levels: int = 16) -> DataFrame:
    """(assembly, component, qty) -> (root, part, total_qty, n_paths)
    over all path lengths 1..max_levels (early-stops when the DAG is
    exhausted). ``total_qty`` = sum over paths of the product of edge
    quantities; ``n_paths`` = number of distinct assembly paths."""
    comp = (components
            .select(F.col("assembly"), F.col("component"),
                    F.col("qty").cast("long").alias("qty"))
            .persist())
    # every level is FULLY materialized (eager localCheckpoint): a
    # partial probe like limit(1) would leave uncached partitions
    # that each later level recomputes recursively down the whole
    # chain — O(depth^2) jobs instead of O(depth)
    cur = (comp
           .groupBy(F.col("assembly").alias("root"),
                    F.col("component").alias("part"))
           .agg(F.sum("qty").alias("total_qty"),
                F.count(F.lit(1)).alias("n_paths"))
           .localCheckpoint(eager=True))
    total = cur
    for _ in range(max_levels - 1):
        nxt = (cur.join(comp, cur["part"] == comp["assembly"])
               .groupBy("root", F.col("component").alias("part"))
               .agg(F.sum(F.col("total_qty") * F.col("qty"))
                    .alias("total_qty"),
                    F.sum("n_paths").alias("n_paths"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        total = total.unionByName(nxt)
        cur = nxt
    out = (total.groupBy("root", "part")
           .agg(F.sum("total_qty").cast("long").alias("total_qty"),
                F.sum("n_paths").cast("long").alias("n_paths")))
    comp.unpersist()
    return out


# ------------------------------------------------ synthetic fixture

def synthetic_bom(part: DataFrame) -> DataFrame:
    """Deterministic acyclic BOM from the ``part`` fixture: assembly
    p has component 2p (qty (p%3)+1) and component 3p+1 (qty (p%2)+1)
    when those keys exist in the table — component keys strictly
    exceed assembly keys, so the graph is a DAG with depth ~log2(N).
    The expression IS the fixture contract; :func:`_synthetic_bom_sql`
    is its DuckDB twin."""
    mx = part.agg(F.max("p_partkey")).collect()[0][0]
    p = F.col("p_partkey")
    # p >= 1 in the doubling branch: 2*0 = 0 would be a self-loop and
    # the graph must stay strictly key-increasing (acyclic)
    a = part.where((p >= 1) & (p * 2 <= mx)).select(
        p.alias("assembly"), (p * 2).alias("component"),
        ((p % 3) + 1).alias("qty"))
    b = part.where(p * 3 + 1 <= mx).select(
        p.alias("assembly"), (p * 3 + 1).alias("component"),
        ((p % 2) + 1).alias("qty"))
    return a.unionByName(b)


def _synthetic_bom_sql() -> str:
    return """
    SELECT p_partkey AS assembly, p_partkey * 2 AS component,
           (p_partkey % 3) + 1 AS qty
    FROM part WHERE p_partkey >= 1
      AND p_partkey * 2 <= (SELECT max(p_partkey) FROM part)
    UNION ALL
    SELECT p_partkey, p_partkey * 3 + 1, (p_partkey % 2) + 1
    FROM part WHERE p_partkey * 3 + 1 <= (SELECT max(p_partkey) FROM part)
""".strip()


def bom_explode_sql(max_levels: int = 16) -> str:
    """DuckDB twin: the same level-aggregated DP unrolled. The level
    budget must dominate the fixture DAG's depth (components at least
    double the key, so depth <= log2(max key) ~ 11 at sf0.01; extra
    levels are empty and harmless)."""
    levels = ["l1 AS (SELECT assembly AS root, component AS part, "
              "CAST(sum(qty) AS BIGINT) AS total_qty, "
              "CAST(count(*) AS BIGINT) AS n_paths "
              "FROM bom GROUP BY assembly, component)"]
    for i in range(2, max_levels + 1):
        levels.append(
            f"l{i} AS (SELECT p.root, c.component AS part,\n"
            f"    CAST(sum(p.total_qty * c.qty) AS BIGINT) AS total_qty,\n"
            f"    CAST(sum(p.n_paths) AS BIGINT) AS n_paths\n"
            f"  FROM l{i - 1} p JOIN bom c ON c.assembly = p.part\n"
            f"  GROUP BY p.root, c.component)")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM l{i}" for i in range(1, max_levels + 1))
    return f"""
WITH bom AS MATERIALIZED (
    {_synthetic_bom_sql()}
), {', '.join(levels)}
SELECT root, part, CAST(sum(total_qty) AS BIGINT) AS total_qty,
       CAST(sum(n_paths) AS BIGINT) AS n_paths
FROM ({union})
GROUP BY root, part
""".strip()
