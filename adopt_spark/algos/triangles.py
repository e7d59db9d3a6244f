"""Triangle counting — the reference's 3-clique flagship query.

Reference semantics (graph_query/3_clique.sql:1): count triples
a < b < c with directed edges (a,b), (b,c), (a,c) all present, i.e.
the id-ordered triangle count of the ``sid < tid``-filtered edge
table. The reference executes this with an adaptive worst-case-optimal
leapfrog triejoin (joining/join/wcoj/HyperCubeEvaluationTask.java);
we provide two Spark-native physical strategies that return the exact
same count:

  * ``method="join"`` — declarative: two self-joins over the
    degree-oriented edge DAG. Catalyst/AQE pick broadcast vs
    sort-merge and split skewed partitions; degree orientation bounds
    every out-list by O(sqrt(E)), which is the statically-optimal
    attribute order the reference learns at runtime via UCT
    (report Table 2, "optimal order" column).
  * ``method="csr"`` — the leapfrog recast as partition-parallel
    cogroup: sorted adjacency arrays per vertex (the trie analogue,
    LFTJiter.java:81-197), one shuffle to attach both endpoint
    adjacency lists to each edge, then a vectorized Arrow-batched
    sorted-intersection kernel (numpy) — the LFTJ seek loop
    (LFTJoin.java:113-145, galloping search) becomes
    ``np.intersect1d`` over sorted slices.

Both run on the undirected pair set {a,b} induced by the lt-filter, so
they agree with each other and with the SQL oracle by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from adopt_spark.edges import adjacency, orient_by_degree


def _lt_pairs(edges: DataFrame) -> DataFrame:
    """The reference's per-alias ``sid < tid`` pre-filter
    (indexing/Indexer.java:96-118 builds exactly this filtered table)."""
    return edges.where(F.col("sid") < F.col("tid")).dropDuplicates(["sid", "tid"])


def triangle_count_join(edges: DataFrame) -> DataFrame:
    """Pure-DataFrame triangle count; returns 1-row DF [n_triangles: long].

    Plan shape: orient → wedge join (e1.dst = e2.src) → close with a
    join back to the oriented edge set on both endpoints. With degree
    orientation the wedge fan-out per vertex is O(sqrt(E)) — worst-case
    optimal for triangle listing.
    """
    o = orient_by_degree(_lt_pairs(edges))
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, ["a", "c"])
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


@F.pandas_udf(LongType())
def _sorted_intersect_count(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized |A ∩ B| over pairs of sorted int arrays.

    Kernel analogue of the reference's leapfrog intersection
    (LFTJoin.seekInRangeExp, galloping+binary search): for each row we
    intersect two sorted adjacency slices. Batches arrive via Arrow;
    per-row work is numpy (np.intersect1d on pre-sorted inputs).
    """
    out = np.empty(len(a), dtype=np.int64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None or len(x) == 0 or len(y) == 0:
            out[i] = 0
            continue
        xs = np.asarray(x, dtype=np.int64)
        ys = np.asarray(y, dtype=np.int64)
        # both sides pre-sorted by sort_array upstream
        out[i] = np.intersect1d(xs, ys, assume_unique=True).size
    return pd.Series(out)


def triangle_count_csr(edges: DataFrame) -> DataFrame:
    """Leapfrog-as-cogroup triangle count; returns [n_triangles: long].

    For every oriented edge (u, v): count |N+(u) ∩ N+(v)| over sorted
    out-adjacency. Two shuffles (adjacency build reuses the edge
    partitioning; one join per endpoint), then the Arrow kernel.
    Hub skew: degree orientation already caps out-lists at O(sqrt(E)),
    so no hub's adjacency array exceeds that bound — the same effect
    the reference gets from hypercube re-splitting.
    """
    o = orient_by_degree(_lt_pairs(edges))
    adj = adjacency(o, "src", "dst")
    e = (
        o.join(adj.withColumnRenamed("src", "u_key").withColumnRenamed("adj", "adj_u"),
               o["src"] == F.col("u_key"))
        .join(adj.withColumnRenamed("src", "v_key").withColumnRenamed("adj", "adj_v"),
              o["dst"] == F.col("v_key"))
        .select("src", "dst", "adj_u", "adj_v")
    )
    per_edge = e.select(_sorted_intersect_count("adj_u", "adj_v").alias("tri"))
    return per_edge.agg(F.coalesce(F.sum("tri"), F.lit(0)).cast("long").alias("n_triangles"))


def triangle_count(edges: DataFrame, method: str = "join") -> DataFrame:
    if method == "join":
        return triangle_count_join(edges)
    if method == "csr":
        return triangle_count_csr(edges)
    raise ValueError(f"unknown method: {method}")
