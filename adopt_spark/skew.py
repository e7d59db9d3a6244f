"""Explicit skew handling: hub-vertex salting.

The reference fights skew by re-splitting unfinished hypercubes at the
value-space frontier (joining/join/wcoj/Hypercube.java:105-121) so no
worker owns a disproportionate slice. The Spark-native equivalents we
use, in order:

  1. AQE skew-join splitting (session.py turns it on) — the automatic
     path, covers sort-merge joins.
  2. Explicit salting (this module) — for aggregations and joins keyed
     by vertex where one hub vertex dominates a partition: split the
     hub's rows across S salts, aggregate partially per salt, then
     merge. This is a two-level aggregation, i.e. map-side combine
     made explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_group_sum(df: DataFrame, key: str, value: str, out: str,
                     salts: int = 16) -> DataFrame:
    """groupBy(key).sum(value) via two-level salted aggregation.

    Deterministic salt = a cheap hash of other columns would break the
    partial-agg property; we use pmod(hash of the *value row id proxy*)
    — here simply a round-robin on the value's bit pattern is not
    needed because Spark's hash-agg already does partial aggregation.
    This helper exists for the pathological case where a single key's
    partials still overflow one reducer: stage 1 groups on
    (key, salt), stage 2 on key.
    """
    salt: Column = F.pmod(F.hash(F.col(value)), F.lit(salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").alias(out))


def hub_vertices(degree_df: DataFrame, threshold: int) -> DataFrame:
    """Vertices whose degree exceeds threshold: DataFrame[v, deg]."""
    return degree_df.where(F.col("deg") > threshold)


def salted_contributions(links: DataFrame, ranks: DataFrame,
                         hub_threshold: int, salts: int = 16) -> DataFrame:
    """PageRank contribution aggregation with hub salting.

    links: [src, dst, inv_deg]; ranks: [v, rank].
    Contributions grouped by dst; a hub dst (in-degree > threshold)
    would funnel its entire in-neighborhood through one reducer, so we
    pre-aggregate per (dst, salt) first. Non-hub keys skip the extra
    shuffle by unioning the two paths.
    """
    contrib = (
        links.join(ranks.withColumnRenamed("v", "src"), "src")
        .select("dst", (F.col("rank") * F.col("inv_deg")).alias("c"))
    )
    indeg = links.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    hubs = hub_vertices(indeg, hub_threshold).select("dst")
    hub_part = (
        contrib.join(F.broadcast(hubs), "dst")
        .withColumn("_salt", F.pmod(F.hash("c"), F.lit(salts)))
        .groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
        .groupBy("dst").agg(F.sum("c").alias("contrib"))
    )
    rest = (
        contrib.join(F.broadcast(hubs), "dst", "left_anti")
        .groupBy("dst").agg(F.sum("c").alias("contrib"))
    )
    return hub_part.unionAll(rest)
