"""JCC-H-style skewed relational workload — the reference's headline
robustness benchmark class.

The reference's report (Table 1) carries a JCC-H sf10 row: JCC-H is
TPC-H with *correlations and skew* injected (Boncz et al., "JCC-H:
adding Join Crossing Correlations with skew to TPC-H", TPCTC 2017) —
a handful of "popular" customers/suppliers own most of the orders/
lineitems, which breaks uniform-key optimizers and hash joins. The
reference's adaptive (UCT) join ordering is robust to it; our engine's
counterpart is Catalyst + AQE's runtime skew-join splitting plus the
explicit salting machinery in adopt_spark/skew.py.

This module derives the skewed tables from the sandbox TPC-H parquet
via engine-neutral SQL laws (pure integer modular arithmetic, the same
oracle pattern as queries/job.py), so the identical text runs as Spark
temp views AND DuckDB CTEs:

  * ``orders_sk``   — 75% of orders are re-keyed onto 25 hot
    customers (o_orderkey % 4 != 0 → custkey in 1..25), the rest keep
    their uniform key; the hot key set is itself zipf-ish because
    o_orderkey % 25 is uniform but the 25 hot keys receive ~3%
    of ALL orders each vs ~0.007% for a cold key at sf0.01 — a
    >400x popularity ratio.
  * ``lineitem_sk`` — 60% of lineitems re-keyed onto 10 hot
    suppliers (l_orderkey % 5 != 0 and != 4 → suppkey in 1..10).

Queries mirror the TPC-H shapes most sensitive to the skew (the
customer⋈orders⋈lineitem chain of Q3, the supplier join of Q5, a hot
top-k aggregate of Q18's shape) run OVER the skewed tables. Value
correctness is oracled in DuckDB; the skew-handling evidence (AQE
OptimizeSkewedJoin splitting the hot partitions) is asserted in
tests/test_jcch_skew.py and timed in bench.py (`jcch_skew_suite`).

Reference anchor: report Table 1 "JCC-H" row (robustness vs MonetDB);
/root/reference has no JCC-H generator — this is workload-class
parity, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ------------------------------------------------------- skewed tables
#
# Engine-neutral SELECT text; base tables referenced by name.

SKEWED_TABLES: dict[str, str] = {}

SKEWED_TABLES["orders_sk"] = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 4 <> 0 THEN 1 + (o_orderkey % 25)
            ELSE o_custkey END AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders
""".strip()

SKEWED_TABLES["lineitem_sk"] = """
SELECT l_orderkey, l_partkey,
       CASE WHEN l_orderkey % 5 IN (1, 2, 3) THEN 1 + (l_orderkey % 10)
            ELSE l_suppkey END AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM lineitem
""".strip()

# ------------------------------------------------------------- queries

JCCH_QUERIES: dict[str, str] = {}

# Q3 shape over the skewed customer key: the hot 25 customers funnel
# 75% of orders through the c_custkey join — the exact regime AQE's
# skew-join splitting exists for.
JCCH_QUERIES["jcch_q3_skew"] = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(18,4)) AS revenue,
       o_orderdate
FROM customer, orders_sk, lineitem_sk
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 20
""".strip()

# Q5 shape: the skewed supplier key joins lineitem_sk->supplier while
# customer joins through the skewed order key — two skew-crossing
# joins in one plan.
JCCH_QUERIES["jcch_q5_skew"] = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(18,4)) AS revenue
FROM customer, orders_sk, lineitem_sk, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""".strip()

# Q18 shape: large-volume customers — under the skew law the hot 25
# dominate; the HAVING threshold is raised so the result stays small
# while every hot group is aggregated in full.
JCCH_QUERIES["jcch_q18_skew"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_qty
FROM customer, orders_sk, lineitem_sk
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem_sk
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
      )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""".strip()

# Per-hot-key fan-out profile: the skew itself, measured — count and
# revenue per customer key, top 30. Distinguishes the 25 hot keys
# from the uniform tail in one aggregate (the shape skew.py's salted
# aggregation handles; at this cardinality plain partial-agg suffices
# and the oracle checks the law landed as designed).
JCCH_QUERIES["jcch_hotkeys"] = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_spend
FROM orders_sk
GROUP BY o_custkey
ORDER BY n_orders DESC, o_custkey
LIMIT 30
""".strip()


_BASE = ("orders", "lineitem", "customer", "supplier", "nation", "region")


def register_jcch_views(spark: SparkSession, sf_dir: str) -> None:
    """Create the skewed temp views over the TPC-H parquet tables."""
    for t in _BASE:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    for name, sql in SKEWED_TABLES.items():
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")


def jcch_query(name: str):
    """QueryFn running one skewed query through spark.sql (AQE's
    skew-join splitting active per session defaults)."""
    sql = JCCH_QUERIES[name]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_jcch_views(spark, sf_dir)
        return spark.sql(sql)

    return fn


def jcch_oracle_sql(name: str) -> str:
    """DuckDB twin: skewed tables as CTEs + the identical query text."""
    ctes = ",\n".join(f"{t} AS (\n{sql}\n)"
                      for t, sql in SKEWED_TABLES.items())
    return f"WITH {ctes}\n{JCCH_QUERIES[name]}"
