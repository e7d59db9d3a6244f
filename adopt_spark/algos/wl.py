"""Weisfeiler-Leman (1-WL) color refinement over the edge table.

Iterated neighborhood relabeling — the classic graph-isomorphism
signature (Weisfeiler & Leman 1968; hashed variant per Shervashidze
et al., JMLR'11 "Weisfeiler-Lehman graph kernels"): every vertex's
color is repeatedly replaced by an injective-in-practice hash of
(own color, SORTED multiset of neighbor colors). After r rounds two
vertices share a color only if their radius-r neighborhoods are
1-WL-indistinguishable — a per-vertex structural fingerprint, the
link-graph analogue of doc fingerprinting: useful for bucketing
structurally-identical repo-dependency neighborhoods before any
expensive pairwise comparison.

Hash parity (the contract trick from functions/sketch.py): the
relabel is an exact integer Horner fold over the sorted neighbor
colors, seeded with the vertex's own mixed color —

    h = (own * WL_A + WL_B) mod WL_P
    for c in sorted(neighbor_colors): h = (h * WL_M + c) mod WL_P

with WL_P = 2^31 - 1 and multipliers < 2^31, every intermediate
product fits in a signed 64-bit integer, so Spark's ``aggregate``
lambda and DuckDB's ``list_reduce`` produce bit-identical colors.

Plan shape / scale: one round = one join (neighbor -> its color, a
|V|-row table keyed on vertex) + one groupBy(v) building the sorted
color list. Both shuffles key on the vertex id; the collected list is
bounded by vertex degree — the same skew envelope as LPA's
neighbor-label histogram (algos/lpa.py), handled the same way (AQE
skew splitting; hub splitting in skew.py if needed upstream). The
fold itself is a JVM-side higher-order function — no Python in the
loop.

Reference parity: beyond jxiw/ADOPT (no refinement operator); extends
the vertex-metric surface like Katz/HITS do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WL_P = 2_147_483_647          # 2^31 - 1
WL_A = 1_000_000_007          # own-color mix multiplier
WL_B = 104_729
WL_M = 1_000_003              # Horner fold multiplier
WL_ROUNDS = 3


def wl_colors(edges: DataFrame, rounds: int = WL_ROUNDS) -> DataFrame:
    """Per-vertex 1-WL color after ``rounds`` refinements.

    Treats the edge table as an undirected simple graph (both
    directions, self-loops dropped, duplicates collapsed). Initial
    color = vertex degree. Returns DataFrame[v bigint, wl_color bigint].
    """
    e = edges.select("sid", "tid").where(F.col("sid") != F.col("tid"))
    nbr = (e.select(F.col("sid").alias("v"), F.col("tid").alias("u"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("u")))
           .distinct())
    colors = nbr.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("wl_color"))
    for _ in range(rounds):
        colors = (
            nbr.join(colors.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.sort_array(F.collect_list("wl_color")).alias("cs"))
            .join(colors, "v")
            .select(
                "v",
                F.aggregate(
                    "cs",
                    F.pmod(F.col("wl_color") * F.lit(WL_A) + F.lit(WL_B),
                           F.lit(WL_P)).cast("long"),
                    lambda acc, c: F.pmod(acc * F.lit(WL_M) + c,
                                          F.lit(WL_P)),
                ).alias("wl_color")))
    return colors


def wl_class_sizes(edges: DataFrame, rounds: int = WL_ROUNDS) -> DataFrame:
    """Color-class histogram: DataFrame[wl_color bigint, class_size bigint]."""
    return (wl_colors(edges, rounds).groupBy("wl_color")
            .agg(F.count(F.lit(1)).alias("class_size")))
