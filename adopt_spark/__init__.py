"""adopt_spark — a PySpark-native link-graph analytics engine.

Built from scratch with the capabilities of the reference system
(jxiw/ADOPT, a single-node adaptive worst-case-optimal join engine;
see SURVEY.md). The reference's live workload is graph-pattern
counting (n-cliques / n-cycles) over an ``edge(sid, tid)`` relation
(reference: graph_query/*.sql, bin/create.sql:1-4); this engine
re-expresses that surface — plus PageRank, connected components,
label propagation, and a training-data-pipeline toolbox (dedup,
similarity search, text analysis) — as idiomatic Spark DataFrame
plans with explicit partitioning/skew handling and resumable
checkpoints.

Design stance (SURVEY.md §7):
  * DataFrame/SQL first; Catalyst owns pushdown, pruning, join
    selection, codegen (the analogue of the reference's ASM
    expression compiler, expressions/compilation/ExpressionCompiler.java).
  * Custom physical algorithms (degree-ordered triangle counting,
    iterative graph supersteps) live in engine code over
    pandas/Arrow-vectorized UDFs — never per-row Python.
  * Work partitioning: many more partitions than cores + AQE, the
    Spark-native analogue of the reference's hypercube work queue
    (joining/join/wcoj/HypercubeManager.java).
"""

__version__ = "0.1.0"
