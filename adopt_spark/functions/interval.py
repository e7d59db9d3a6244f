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
              prefix: str = "r_",
              tolerance: float | None = None) -> DataFrame:
    """Left as-of join; result = all left columns + prefixed right_cols
    (NULL where no right row precedes).

    ``tolerance`` (same units as ``on``) bounds staleness like
    pandas.merge_asof: a preceding right row older than
    ``tolerance`` is treated as NO match (all right fields NULL) —
    the standard guard against joining a quote from last week onto
    today's trade. The matched right row's own ``on`` value rides in
    the carried struct, so the bound is one CASE on the output — the
    window plan is unchanged.
    """
    if tolerance is not None and not tolerance >= 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    left_struct_t = left.select(F.struct(*left.columns).alias("s")) \
                        .schema["s"].dataType
    right_struct_t = right.select(
        F.struct(*right_cols, F.col(on).alias("_rt")).alias("s")) \
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
        F.struct(*right_cols, F.col(on).alias("_rt")).alias("_r"),
    )
    # right rows sort before left rows at equal time -> inclusive <=
    w = (Window.partitionBy(*by).orderBy(F.col("_t"), F.col("_is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lu.unionByName(ru).select(
        "_is_left", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    )
    # numeric `on` required when tolerance is set (pass an epoch
    # column for timestamps) — the subtraction stays exact integer/
    # double arithmetic instead of engine-specific interval algebra
    fresh = (F.lit(True) if tolerance is None else
             (F.col(f"_l.{on}") - F.col("_c._rt")) <= F.lit(tolerance))
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.when(fresh, F.col(f"_c.{c}")).alias(f"{prefix}{c}")
          for c in right_cols],
    )


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str,
                       by: list[str], right_cols: list[str],
                       bucket_width: float | int,
                       prefix: str = "r_") -> DataFrame:
    """asof_join for MONSTER keys: time-bucketed two-pass plan.

    ``asof_join`` windows each ``by`` key's full history in one task —
    correct, but a key holding 10^9 rows serializes. This variant
    splits every key into time buckets of ``bucket_width`` (same unit
    as ``on``; seconds for timestamps):

      1. per (key, bucket): the last right row IN the bucket — one
         partial-aggregated groupBy;
      2. carry-in per (key, bucket): the last right row from any
         EARLIER bucket — an asof_join over the per-bucket summaries
         (per-key window, but over #buckets rows, not #rows);
      3. the final window runs per (key, BUCKET): within-bucket carry
         of the latest right row, carry-in as the fallback.

    Max task size drops from O(rows-per-key) to O(rows-per-key-per-
    bucket); the monster key's timeline parallelizes across buckets.
    Semantics identical to asof_join (inclusive <=, latest-right-row-
    atomically; right unique per (by, on)) — pinned by a differential
    test over a 90%-skew fixture.
    """
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    from pyspark.sql.types import DateType, TimestampType

    on_type = left.schema[on].dataType
    if isinstance(on_type, (TimestampType, DateType)):
        def num(c): return F.unix_micros(F.col(c).cast("timestamp")) / 1_000_000.0
    else:
        def num(c): return F.col(c).cast("double")

    bkt = lambda c: F.floor(num(c) / F.lit(float(bucket_width)))
    right_struct_t = right.select(F.struct(*right_cols).alias("s")) \
                          .schema["s"].dataType

    # 1. last right row per (by, bucket): max_by keeps the payload
    #    struct of the bucket's latest right row
    rb = (
        right.withColumn("_bkt", bkt(on))
        .groupBy(*by, "_bkt")
        .agg(F.max_by(F.struct(*right_cols), F.col(on)).alias("_last_r"))
    )
    # 2. carry-in per left (by, bucket): the summary's own asof —
    #    right bucket b' becomes visible at bucket b'+1, so the shared
    #    ordering column is the left bucket vs (right bucket + 1)
    lb = left.select(*by, bkt(on).alias("_bkt")).dropDuplicates([*by, "_bkt"])
    carry = asof_join(
        lb.withColumnRenamed("_bkt", "_t_ord"),
        rb.select(*by, (F.col("_bkt") + 1).alias("_t_ord"), "_last_r"),
        on="_t_ord", by=by, right_cols=["_last_r"], prefix="_c_",
    ).select(*by, F.col("_t_ord").alias("_bkt"),
             F.col("_c__last_r").alias("_carry"))
    # 3. within-bucket window: union-tag, carry latest right, fall back
    #    to the bucket's carry-in
    lu = left.select(
        *[F.col(c) for c in by], bkt(on).alias("_bkt"),
        F.col(on).alias("_t"), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right_struct_t).alias("_r"),
    )
    ru = right.select(
        *[F.col(c) for c in by], bkt(on).alias("_bkt"),
        F.col(on).alias("_t"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(lu.schema["_l"].dataType).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    w = (Window.partitionBy(*by, "_bkt")
         .orderBy(F.col("_t"), F.col("_is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lu.unionByName(ru).select(
        *by, "_bkt", "_is_left", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_in_bkt"),
    )
    out = (
        carried.where(F.col("_is_left") == 1)
        .join(carry, [*by, "_bkt"], "left")
        .select("_l", F.coalesce(F.col("_in_bkt"), F.col("_carry")).alias("_c"))
    )
    return out.select(
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str = "s",
    left_end: str = "e",
    right_start: str = "s",
    right_end: str = "e",
    bucket: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs whose CLOSED intervals overlap:
    ``l.start <= r.end AND r.start <= l.end`` (integer endpoints,
    e.g. epoch seconds).

    Physical plan (the standard distributed interval join): each
    interval explodes into the width-``bucket`` cells it covers, the
    two sides equi-join on the cell, and the exact overlap predicate
    filters. Each overlapping pair is emitted EXACTLY ONCE without a
    dedup shuffle: a candidate survives only in the cell containing
    the overlap's start (``floor(max(starts)/bucket) == cell``) — the
    classic attribute-to-first-cell trick. Candidate volume is
    output + cell collisions, never |L|x|R|; pick ``bucket`` near the
    median interval length so fan-out stays O(1) per row.

    Right-side columns are suffixed with ``suffix`` on name clashes.
    """
    if bucket <= 0:
        raise ValueError("bucket must be a positive integer")

    def explode_cells(df, s, e, side):
        cell = F.explode(F.sequence(
            F.floor(F.col(s) / bucket).cast("long"),
            F.floor(F.col(e) / bucket).cast("long"))).alias("_cell")
        return df.where(F.col(s) <= F.col(e)).select("*", cell)

    clash = set(left.columns) & set(right.columns)
    r = right
    for c in clash:
        r = r.withColumnRenamed(c, c + suffix)
    rs, re_ = (right_start + suffix if right_start in clash else right_start,
               right_end + suffix if right_end in clash else right_end)
    le = explode_cells(left, left_start, left_end, "l")
    re2 = explode_cells(r, rs, re_, "r")
    ov_start = F.greatest(F.col(left_start), F.col(rs))
    return (le.join(re2, "_cell")
            .where((F.col(left_start) <= F.col(re_))
                   & (F.col(rs) <= F.col(left_end))
                   & (F.floor(ov_start / bucket).cast("long")
                      == F.col("_cell")))
            .drop("_cell"))


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch gap-sessionization -> one row per session:
    (``key_col``, session_idx, s_start, s_end, n_events), epoch-second
    timestamps, sessions numbered 1.. per key in time order.

    The batch twin of streaming/stateful.py's stateful sessionizer
    (same gap semantics, whole-history input): the classic two-window
    plan — ``lag`` marks gap breaks, a running sum of breaks numbers
    the sessions, one aggregate collapses them. Both windows share the
    SAME partitioning (one shuffle on the key); per-key history sits in
    one task, so a monster key serializes — the documented trade-off
    as asof_join, with the bucketed variant the escape hatch there.
    """
    from pyspark.sql import Window

    t = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = Window.partitionBy(key_col).orderBy("t", "tie")
    base = events.select(
        F.col(key_col), t.alias("t"),
        # deterministic tie-break for equal timestamps on both engines
        F.col("event_id").alias("tie"))
    marked = base.withColumn(
        "brk",
        F.when(F.col("t") - F.lag("t").over(w) > gap_seconds, 1)
         .otherwise(0))
    sess = marked.withColumn(
        "session_idx",
        (F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)) + 1).cast("long"))
    return (sess.groupBy(key_col, "session_idx")
            .agg(F.min("t").alias("s_start"),
                 F.max("t").alias("s_end"),
                 F.count(F.lit(1)).alias("n_events")))
