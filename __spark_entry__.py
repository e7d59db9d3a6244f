"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship: lineitem-derived edge table → WCOJ-style CSR
             cogroup triangle count (the reference's 3-clique,
             graph_query/3_clique.sql, recast per SURVEY.md §4.3).
queries()  — one entry per implemented operator from SURVEY.md §2
             (see adopt_spark/queries/registry.py).
oracle_sql() — matching DuckDB SQL for EVERY query (since round 3 the
             iterative / LSH / codec operators carry generated oracles
             too — fixed-iteration CTE unrolling, bounded-depth
             peeling, shared-hash replication, closed-form payloads;
             see adopt_spark/queries/oracle_gen.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adopt_spark.queries.registry import all_oracles, all_queries

SF_TINY = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Adaptive triangle count: measures the wedge/edge ratio and picks
    wedge-join vs broadcast-CSR vs cogroup leapfrog (SURVEY.md §4.3).
    """
    from adopt_spark.algos.triangles import triangle_count
    from adopt_spark.edges import derived_edges

    edges = derived_edges(spark, SF_TINY)
    return triangle_count(edges, "auto")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return all_oracles()
