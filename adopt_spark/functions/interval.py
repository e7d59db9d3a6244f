"""As-of and band (range) joins — ordered-join operators Spark lacks.

The reference evaluates only equi-joins plus same-table inequality
pre-filters (SURVEY.md §2.3); real training-data pipelines constantly
need the two ordered joins below, so they are first-class here:

  * ``asof_join`` — for every left row, the LATEST right row with
    ``right.on <= left.on`` within the same ``by`` keys (the classic
    point-in-time join). Physical plan: union-tag both sides, ONE
    shuffle on the ``by`` keys, one window pass carrying the last
    right payload forward (``last(..., ignorenulls)`` over rows
    unbounded-preceding..current). No range explosion, no per-key
    driver logic — the 100-TB shape. At equal timestamps the right
    row is visible to the left row (inclusive <=), matching DuckDB's
    ASOF JOIN, which is the differential oracle in the contract.
  * ``band_join`` — pairs with ``|left.on - right.on| <= band``.
    Physical plan: coarse bucketing at width=band; each right row
    lands in its bucket and the two adjacent buckets (any in-band
    pair must share one of the three), equi-join on the bucket key,
    exact filter after. Candidate count is output-bound for
    band ≪ value range — never a cross join.

Both are deterministic. ``asof_join`` requires the right side unique
per (by, on) — pre-aggregate duplicates first (the contract query
keeps max_by event id), otherwise which duplicate wins is undefined
in every engine's as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: list[str], right_cols: list[str],
              prefix: str = "r_") -> DataFrame:
    """Left as-of join; result = all left columns + prefixed right_cols
    (NULL where no right row precedes)."""
    left_struct_t = left.select(F.struct(*left.columns).alias("s")) \
                        .schema["s"].dataType
    right_struct_t = right.select(F.struct(*right_cols).alias("s")) \
                          .schema["s"].dataType
    # The right payload travels as ONE struct (non-null for every right
    # row even when its fields are null), so the window carry picks the
    # latest right ROW atomically — carrying columns independently with
    # ignorenulls would resurrect stale non-null values field-by-field
    # and could mix fields from different right rows.
    lu = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right_struct_t).alias("_r"),
    )
    ru = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(left_struct_t).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    # right rows sort before left rows at equal time -> inclusive <=
    w = (Window.partitionBy(*by).orderBy(F.col("_t"), F.col("_is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lu.unionByName(ru).select(
        "_is_left", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    )
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def band_join(left: DataFrame, right: DataFrame,
              left_on: str, right_on: str, band: float,
              how_cols: tuple[str, str] = ("l", "r")) -> DataFrame:
    """All pairs with |left.left_on - right.right_on| <= band.

    Returns left columns prefixed how_cols[0]_ and right columns
    prefixed how_cols[1]_ (plus nothing else); callers project.

    ``band`` must be > 0: the bucket key divides by it, and a zero/
    negative band would silently produce NULL bucket keys (empty
    result) in non-ANSI Spark. An exact-match request is a plain
    equi-join — do that directly.
    """
    if not band > 0:
        raise ValueError(
            f"band_join requires band > 0, got {band}; "
            "for exact matches use an equi-join on the value columns")
    lp, rp = how_cols
    lpref = left.select([F.col(c).alias(f"{lp}_{c}") for c in left.columns])
    rpref = right.select([F.col(c).alias(f"{rp}_{c}") for c in right.columns])
    lcol, rcol = f"{lp}_{left_on}", f"{rp}_{right_on}"
    lb = lpref.withColumn("_bk", F.floor(F.col(lcol) / F.lit(band)))
    rb = rpref.withColumn(
        "_bk0", F.floor(F.col(rcol) / F.lit(band))
    ).select("*", F.explode(F.array(
        F.col("_bk0") - 1, F.col("_bk0"), F.col("_bk0") + 1)).alias("_bk"))
    out = (lb.join(rb, "_bk")
           .where(F.abs(F.col(lcol) - F.col(rcol)) <= band)
           .drop("_bk", "_bk0"))
    return out
