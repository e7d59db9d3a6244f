"""Spatial analytics on integer grid coordinates.

The engine's spatial family works on INTEGER coordinates (points are
pre-quantized to a grid — at planetary scale, ~1e7 units ≈ 1cm
resolution in a local projection), so every distance comparison is
exact int64 arithmetic: no engine ever disagrees with another over a
float epsilon, and every operator below is value-for-value
oracle-checkable.

Operators
  * ``grid_distance_join`` — all point pairs within radius R, via
    cell bucketing: each point lands in a (ix//R, iy//R) cell, pairs
    can only be within R if their cells are adjacent (Chebyshev <= 1),
    so the candidate set is 9 equi-joins on the cell key — never the
    n² cross product. The classic band-join construction lifted to 2D
    (functions/interval.py:band_join is the 1D case).
  * ``hotspot_cells`` — Getis-Ord-style density hotspots: per-cell
    counts, 3x3-neighborhood sums (each occupied cell SCATTERS its
    count to its 9 neighbor keys — one explode + one re-aggregate, no
    self-join matrix), and the neighborhood's lift over the global
    occupied-cell mean.
  * ``spatial_knn_exact`` — EXACT k-nearest-neighbors with a
    two-phase grid plan: phase 1 bounds the kth distance from the
    5x5 block around each query (any k candidates upper-bound the
    true kth distance); phase 2 enumerates exactly the cells that
    intersect each query's bounding disk (per-query ``sequence()``
    ring explode — ring radius adapts to LOCAL density) and ranks
    exact distances. Equal to the brute-force answer by construction,
    but each query touches O(points within its disk), not O(n).

Scale shape: everything is equi-joins and aggregates on cell keys;
skewed cells (urban cores) are ordinary skewed join keys — AQE /
salting applies unchanged. No reference counterpart (ADOPT has no
spatial types); this is new-engine surface in the band-join idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _with_cell(pts: DataFrame, cell: int, ix: str = "ix",
               iy: str = "iy") -> DataFrame:
    # floor-div on possibly-negative ints: Spark's `div` truncates
    # toward zero, so build floor division explicitly
    def fdiv(c):
        return F.floor(F.col(c) / F.lit(float(cell))).cast("long")
    return pts.withColumn("cx", fdiv(ix)).withColumn("cy", fdiv(iy))


def grid_distance_join(points: DataFrame, radius: int,
                       id_col: str = "id") -> DataFrame:
    """All unordered pairs with squared distance <= radius².

    ``points``: (id, ix:long, iy:long). Output: (id_a, id_b, d2)
    with id_a < id_b, exact int64 d2. Cell size = radius, so any
    in-range pair is in Chebyshev-adjacent cells; each candidate pair
    arises from exactly ONE (dx,dy) offset, hence no dedup pass.
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    a = _with_cell(points.select(F.col(id_col).alias("id_a"),
                                 F.col("ix").alias("xa"),
                                 F.col("iy").alias("ya")),
                   radius, "xa", "ya")
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFSETS])).alias("o")
    b = (_with_cell(points.select(F.col(id_col).alias("id_b"),
                                  F.col("ix").alias("xb"),
                                  F.col("iy").alias("yb")),
                    radius, "xb", "yb")
         .select("*", off)
         .select("id_b", "xb", "yb",
                 (F.col("cx") + F.col("o.dx")).alias("kx"),
                 (F.col("cy") + F.col("o.dy")).alias("ky")))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (a.join(b, (a.cx == b.kx) & (a.cy == b.ky))
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", d2.alias("d2"))
            .where(F.col("d2") <= F.lit(radius * radius)))


def grid_distance_join_sql(table: str, id_expr: str, ix_expr: str,
                           iy_expr: str, radius: int) -> str:
    """DuckDB twin: the NAIVE exact plan (cross join + filter) — the
    strongest possible oracle for the bucketed plan, feasible at
    fixture scale."""
    return f"""
WITH p AS (SELECT {id_expr} AS id, {ix_expr} AS ix, {iy_expr} AS iy
           FROM {table})
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.ix - b.ix) * (a.ix - b.ix)
            + (a.iy - b.iy) * (a.iy - b.iy) AS BIGINT) AS d2
FROM p a JOIN p b ON a.id < b.id
WHERE (a.ix - b.ix) * (a.ix - b.ix)
      + (a.iy - b.iy) * (a.iy - b.iy) <= {radius * radius}
""".strip()


def hotspot_cells(points: DataFrame, cell: int) -> DataFrame:
    """Per occupied cell: n points, 3x3-neighborhood point total, and
    the neighborhood's lift over 9x the global occupied-cell mean.

    One aggregate builds cell counts; each cell then scatters its
    count to its 9 neighbor keys (explode) and a second aggregate
    collects per-center sums — O(9 * occupied cells) intermediate,
    independent of point count. Only occupied centers are emitted.
    """
    if cell <= 0:
        raise ValueError(f"cell must be > 0, got {cell}")
    counts = (_with_cell(points, cell)
              .groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n")))
    scattered = (counts.select(
        "n", F.explode(F.array(*[
            F.struct((F.col("cx") + dx).alias("tx"),
                     (F.col("cy") + dy).alias("ty"))
            for dx, dy in _OFFSETS])).alias("t"))
        .groupBy("t.tx", "t.ty").agg(F.sum("n").alias("nbhd_n")))
    mean9 = counts.agg((F.avg("n") * 9).alias("m9"))
    return (counts.join(scattered,
                        (counts.cx == scattered.tx)
                        & (counts.cy == scattered.ty))
            .crossJoin(F.broadcast(mean9))
            .select("cx", "cy", "n", "nbhd_n",
                    F.round(F.col("nbhd_n") / F.col("m9"), 6)
                    .alias("lift")))


def hotspot_cells_sql(table: str, ix_expr: str, iy_expr: str,
                      cell: int) -> str:
    """DuckDB twin of :func:`hotspot_cells` (9-offset self-join form)."""
    return f"""
WITH c AS (
  SELECT CAST(floor(({ix_expr}) / {cell}.0) AS BIGINT) AS cx,
         CAST(floor(({iy_expr}) / {cell}.0) AS BIGINT) AS cy,
         count(*) AS n
  FROM {table} GROUP BY 1, 2
), nb AS (
  SELECT a.cx, a.cy, sum(b.n) AS nbhd_n
  FROM c a JOIN c b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  GROUP BY a.cx, a.cy
)
SELECT c.cx, c.cy, CAST(c.n AS BIGINT) AS n,
       CAST(nb.nbhd_n AS BIGINT) AS nbhd_n,
       round(nb.nbhd_n / (9 * (SELECT avg(n) FROM c)), 6) AS lift
FROM c JOIN nb ON c.cx = nb.cx AND c.cy = nb.cy
""".strip()


def spatial_knn_exact(points: DataFrame, queries: DataFrame, k: int,
                      cell: int, max_coord: int,
                      id_col: str = "id") -> DataFrame:
    """Exact k nearest neighbors of each query point (self excluded).

    Two-phase grid plan (see module docstring). Ties break on
    neighbor id, so output is deterministic: (query_id, neighbor_id,
    rank, d2), rank 1..k (fewer if the corpus has < k other points).
    ``max_coord`` bounds the ring when a 5x5 block holds < k
    candidates (isolated query → that query degrades to full scan,
    which IS its exact cost).
    """
    if k <= 0 or cell <= 0:
        raise ValueError("k and cell must be > 0")
    pts = _with_cell(points.select(F.col(id_col).alias("nid"),
                                   F.col("ix").alias("px"),
                                   F.col("iy").alias("py")), cell,
                     "px", "py")
    qs = _with_cell(queries.select(F.col(id_col).alias("qid"),
                                   F.col("ix").alias("qx"),
                                   F.col("iy").alias("qy")), cell,
                    "qx", "qy").withColumnRenamed("cx", "qcx") \
        .withColumnRenamed("cy", "qcy")

    d2 = ((F.col("qx") - F.col("px")) * (F.col("qx") - F.col("px"))
          + (F.col("qy") - F.col("py")) * (F.col("qy") - F.col("py")))

    # phase 1: kth-distance upper bound from the 5x5 block
    block = (qs.select("qid", "qx", "qy", "qcx", "qcy",
                       F.explode(F.sequence(F.col("qcx") - 2,
                                            F.col("qcx") + 2))
                       .alias("bx"))
             .select("*", F.explode(F.sequence(F.col("qcy") - 2,
                                               F.col("qcy") + 2))
                     .alias("by")))
    cand = (block.join(pts, (block.bx == pts.cx) & (block.by == pts.cy))
            .where(F.col("nid") != F.col("qid"))
            .select("qid", d2.alias("d2")))
    w = Window.partitionBy("qid").orderBy("d2")
    kth = (cand.withColumn("r", F.row_number().over(w))
           .where(F.col("r") <= k)
           .groupBy("qid").agg(F.max("d2").alias("bound"),
                               F.count(F.lit(1)).alias("got")))
    # ring radius in cells; under-filled queries scan everything
    full_ring = int(max_coord // cell) + 1
    bounds = (qs.join(kth, "qid", "left")
              .withColumn("ring", F.when(
                  F.col("got") >= k,
                  # +1 guards the float-sqrt edge at exact cell
                  # multiples (ceil of a 0.5-ulp-under sqrt could
                  # otherwise drop the outermost ring)
                  F.ceil(F.sqrt(F.col("bound").cast("double"))
                         / F.lit(float(cell))).cast("long") + 1)
                  .otherwise(F.lit(full_ring))))

    # phase 2: exact search over every cell intersecting the disk
    ring = (bounds.select("qid", "qx", "qy",
                          F.explode(F.sequence(F.col("qcx")
                                               - F.col("ring"),
                                               F.col("qcx")
                                               + F.col("ring")))
                          .alias("bx"),
                          F.col("qcy"), F.col("ring"))
            .select("qid", "qx", "qy", "bx",
                    F.explode(F.sequence(F.col("qcy") - F.col("ring"),
                                         F.col("qcy") + F.col("ring")))
                    .alias("by")))
    hits = (ring.join(pts, (ring.bx == pts.cx) & (ring.by == pts.cy))
            .where(F.col("nid") != F.col("qid"))
            .select("qid", "nid", d2.alias("d2")))
    w2 = Window.partitionBy("qid").orderBy("d2", "nid")
    return (hits.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("qid", "nid", "rank", "d2"))


def spatial_knn_sql(table: str, id_expr: str, ix_expr: str,
                    iy_expr: str, query_pred: str, k: int) -> str:
    """DuckDB twin: brute-force exact KNN (cross join + rank)."""
    return f"""
WITH p AS (SELECT {id_expr} AS id, {ix_expr} AS ix, {iy_expr} AS iy
           FROM {table}),
q AS (SELECT * FROM p WHERE {query_pred}),
d AS (
  SELECT q.id AS qid, p.id AS nid,
         (q.ix - p.ix) * (q.ix - p.ix)
         + (q.iy - p.iy) * (q.iy - p.iy) AS d2
  FROM q JOIN p ON p.id <> q.id
)
SELECT qid, nid,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, nid)
            AS INT) AS rank,
       CAST(d2 AS BIGINT) AS d2
FROM d QUALIFY rank <= {k}
""".strip()
