"""ReFeX-style recursive role features + role assignment
(Henderson et al., KDD'11 "It's Who You Know: Graph Mining Using
Recursive Structural Features").

Structural ROLES generalize structural equivalence: instead of
requiring identical neighbor SETS, vertices are grouped by identical
recursive feature signatures — local features (degree, triangle
count) repeatedly aggregated over neighborhoods, then quantized.
Hubs, bridges, clique members, and peripheral vertices land in
different roles regardless of WHERE in the graph they sit — the
transfer-learning primitive for cross-graph node classification.

This implementation follows the paper's recipe deterministically:

  base features   f = (deg, tri)
  recursion       two rounds of neighbor MEANS (each mean rounded to
                  6 dp before the next round, pinning cross-engine
                  libm/summation drift at the round boundary)
  quantization    logarithmic binning: bin(x) = #{ j in 0..19 :
                  x >= 2^j } — implemented as a chain of exact
                  threshold comparisons (no log() call, so there is
                  no rounding boundary to flip cross-engine; powers
                  of two are exact doubles)
  roles           vertices grouped by the 6-bin signature; role id =
                  min member id (the same canonical-rep law as
                  structural_equiv)

Scale shape: degree/triangles are the oracle-green vertex_metrics
aggregates; each recursion round is ONE neighbor equi-join + one
per-vertex mean (map-side partial agg) — 2 rounds = 2 shuffles of the
feature vector, never the graph; binning and the signature group-by
are plain codegen Column expressions. Hub vertices are ordinary
skewed aggregation keys (AQE handles them like every other groupBy
in this engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from adopt_spark.algos.vertex_metrics import (
    _lt, _sym, vertex_triangle_counts,
)

N_BIN_THRESHOLDS = 20        # bins 0..20 cover x < 2^20


def log_bin(x: Column) -> Column:
    """#{ j in 0..19 : x >= 2^j } as exact threshold comparisons."""
    terms = [F.when(x >= float(1 << j), 1).otherwise(0)
             for j in range(N_BIN_THRESHOLDS)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def refex_roles(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Per-vertex recursive role signature and role id ->
    [v, b_deg, b_tri, b_nd, b_nt, b_nd2, b_nt2, role]
    (with ``rounds=2``; each round appends two binned neighbor-mean
    columns, so other values change the schema accordingly)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    lt = _lt(edges)
    sym = _sym(lt)
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    tri = vertex_triangle_counts(lt)
    feats = (deg.join(tri, "v", "left")
             .select("v", F.col("deg").cast("double").alias("f1"),
                     F.coalesce("tri", F.lit(0)).cast("double").alias("f2")))
    cur = ("f1", "f2")
    for r in range(rounds):
        nf = (sym.join(feats.withColumnRenamed("v", "nbr"), "nbr")
              .groupBy("v")
              .agg(F.round(F.avg(cur[0]), 6).alias(f"g{r}1"),
                   F.round(F.avg(cur[1]), 6).alias(f"g{r}2")))
        feats = feats.join(nf, "v")
        cur = (f"g{r}1", f"g{r}2")

    cols = ["f1", "f2"] + [f"g{r}{i}" for r in range(rounds)
                           for i in (1, 2)]
    # programmatic per-round names (round 0 keeps the historical
    # b_nd/b_nt, later rounds are b_nd2/b_nt2, b_nd3/b_nt3, ...) so
    # any ``rounds`` value yields a complete, collision-free schema
    names = ["b_deg", "b_tri"] + [
        f"b_n{f}{'' if r == 0 else r + 1}"
        for r in range(rounds) for f in ("d", "t")]
    binned = feats.select(
        "v", *[log_bin(F.col(c)).cast("long").alias(n)
               for c, n in zip(cols, names)])
    rep = (binned.groupBy(*names)
           .agg(F.min("v").alias("role")))
    return binned.join(rep, names).select("v", *names, "role")
