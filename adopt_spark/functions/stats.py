"""Distribution-drift and inference statistics over DataFrames.

A training-data pipeline needs gatekeeping statistics, not just
aggregates: "did this feed's distribution move?" (two-sample KS,
Mann-Whitney, CUSUM), "is this experiment's lift real?" (Welch t),
"how long do users survive?" (Kaplan-Meier), "do these features
co-move?" (Pearson/Spearman). The reference engine stops at SQL
aggregates (jxiw/ADOPT preprocessing/AggregationProcessor.java); this
module is the beyond-reference statistics layer, matching the repo's
chi-square entry (queries/registry.py:q_chi_square).

Scale notes (100 TB discipline):

* Every test here first collapses the input to per-distinct-value or
  per-group counts with a hash aggregate (map-side partial), so the
  expensive pass is one shuffle of (value, count) pairs — never raw
  rows — and the post-aggregate frame is bounded by |distinct values|
  (ECDF tests) or |groups| (everything else).
* The ECDF cumulative sums run in an un-partitioned window over that
  collapsed frame. That is a deliberate, documented bound: the window
  input is |distinct pooled values| rows, which for a 100 TB feed of
  bounded-cardinality metrics is millions of rows, not the raw row
  count. Should the distinct-value cardinality itself explode, the
  standard fix is range-partitioned two-pass prefix sums; the
  operator's contract (exact sup-statistic) is unchanged.
* All statistics use exact integer cross-multiplication where a
  comparison could sit on a float boundary (KS uses
  |c1*n2 - c2*n1| over the integer lattice) and round to 6 dp only
  at the final emitted statistic, per the repo's cross-engine float
  discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "ks_2sample", "mann_whitney_u", "welch_ttest", "cusum_drift",
    "spearman_corr", "km_survival",
]


def _two_group_value_counts(df: DataFrame, group_col: str, value_col: str,
                            g1: str, g2: str) -> DataFrame:
    """Collapse raw rows to per-distinct-value counts for two groups.

    One hash aggregate; output rows = |distinct pooled values|.
    """
    return (
        df.where(F.col(group_col).isin([g1, g2]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.when(F.col(group_col) == g1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col(group_col) == g2, 1).otherwise(0)).alias("c2"),
        )
    )


def ks_2sample(df: DataFrame, group_col: str, value_col: str,
               g1: str, g2: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D = sup_v |F1(v) - F2(v)|.

    Exact: the sup runs over the pooled distinct values (where the
    ECDF difference attains its extrema), and the comparison is done
    on the integer lattice |cum1*n2 - cum2*n1| so no float ordering
    can perturb which value attains the sup. One row out:
    (n1, n2, d_stat).
    """
    counts = _two_group_value_counts(df, group_col, value_col, g1, g2)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    # totals are the last cumulative values == per-group maxima
    tot = cum.agg(F.max("cum1").alias("n1"), F.max("cum2").alias("n2"))
    joined = cum.crossJoin(F.broadcast(tot))
    return joined.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.round(
            F.max(F.abs(F.col("cum1") * F.col("n2")
                        - F.col("cum2") * F.col("n1")))
            / (F.max("n1") * F.max("n2")), 6).alias("d_stat"),
    )


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str,
                   g1: str, g2: str) -> DataFrame:
    """Mann-Whitney U with average ranks and tie-corrected normal z.

    Rank arithmetic stays on the halves lattice (average rank of a
    tie block is cum_before + (t+1)/2 — an exact multiple of 0.5),
    so R1/U1/U2 are exact in doubles; only the final z is rounded.
    One row out: (n1, n2, u1, u2, z).
    """
    counts = _two_group_value_counts(df, group_col, value_col, g1, g2)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = counts.select(
        "c1", "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        (F.sum(F.col("c1") + F.col("c2")).over(w)
         - (F.col("c1") + F.col("c2"))).alias("before"),
    )
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (F.col("before") + (F.col("t") + 1) / 2))
         .alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
         .alias("tie3"),
    )
    return agg.select(
        "n1", "n2",
        F.round(F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2, 6)
         .alias("u1"),
        F.round(F.col("n1") * F.col("n2")
                - (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2), 6)
         .alias("u2"),
        F.round(
            ((F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2)
             - F.col("n1") * F.col("n2") / 2)
            / F.sqrt(
                F.col("n1") * F.col("n2") / 12.0
                * ((F.col("n1") + F.col("n2") + 1)
                   - F.col("tie3")
                   / ((F.col("n1") + F.col("n2"))
                      * (F.col("n1") + F.col("n2") - 1)))),
            6).alias("z"),
    )


def welch_ttest(df: DataFrame, group_col: str, value_col: str,
                g1: str, g2: str) -> DataFrame:
    """Welch's unequal-variance t test between two groups' means.

    One hash aggregate builds both groups' (n, mean, var_samp) in a
    single pass (conditional aggregation, no second scan); t and the
    Welch-Satterthwaite df are rounded 6 dp. One row out:
    (n1, n2, mean1, mean2, t_stat, df).
    """
    v, g = F.col(value_col), F.col(group_col)
    agg = df.where(g.isin([g1, g2])).agg(
        F.count(F.when(g == g1, 1)).alias("n1"),
        F.count(F.when(g == g2, 1)).alias("n2"),
        F.avg(F.when(g == g1, v)).alias("m1"),
        F.avg(F.when(g == g2, v)).alias("m2"),
        F.var_samp(F.when(g == g1, v)).alias("s1"),
        F.var_samp(F.when(g == g2, v)).alias("s2"),
    )
    se1 = F.col("s1") / F.col("n1")
    se2 = F.col("s2") / F.col("n2")
    return agg.select(
        "n1", "n2",
        F.round("m1", 6).alias("mean1"),
        F.round("m2", 6).alias("mean2"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 6)
         .alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1)
               + se2 * se2 / (F.col("n2") - 1)), 6).alias("df"),
    )


def cusum_drift(df: DataFrame, day_col: Column, value_col: str) -> DataFrame:
    """Page-style CUSUM drift over the daily mean of a metric.

    Per-day means are rounded to 6 dp BEFORE the cumulative pass
    (round-then-compare discipline: every downstream sum runs on the
    same 6 dp lattice in any engine), deviations are taken against
    the mean-of-day-means, and the emitted per-day drawup is
    S_t - min_{s<=t} S_s (the one-sided CUSUM exceedance; its max
    over days is Page's statistic without reset). Output one row per
    day: (day, day_mean, s, drawup) — |days| rows, trivially bounded.
    """
    daily = (
        df.groupBy(day_col.alias("day"))
        .agg(F.round(F.avg(value_col), 6).alias("day_mean"))
    )
    grand = daily.agg(F.round(F.avg("day_mean"), 6).alias("gm"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        daily.crossJoin(F.broadcast(grand))
        .withColumn("s", F.round(
            F.sum(F.col("day_mean") - F.col("gm")).over(w), 6))
    )
    return cum.select(
        "day", "day_mean", "s",
        F.round(F.col("s") - F.min("s").over(w), 6).alias("drawup"),
    )


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation with average-rank ties.

    Inputs are expected 6 dp-quantized by the caller (ties must be
    decided on the same lattice in every engine). Ranks come from the
    same collapsed-counts + cumulative-window shape as the ECDF
    tests; the correlation is Pearson on ranks via exact moment sums.
    One row out: (n, rho).
    """
    def ranks(col: str, out: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("t"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        return counts.select(
            F.col("v").alias(col),
            (F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2)
            .alias(out))
    rx = ranks(x_col, "rank_x")
    ry = ranks(y_col, "rank_y")
    ranked = df.join(rx, x_col).join(ry, y_col)
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank_x").alias("sx"), F.sum("rank_y").alias("sy"),
        F.sum(F.col("rank_x") * F.col("rank_y")).alias("sxy"),
        F.sum(F.col("rank_x") * F.col("rank_x")).alias("sxx"),
        F.sum(F.col("rank_y") * F.col("rank_y")).alias("syy"),
    )
    n = F.col("n")
    return m.select(
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                     * (n * F.col("syy") - F.col("sy") * F.col("sy"))),
            6).alias("rho"),
    )


def km_survival(spans: DataFrame) -> DataFrame:
    """Kaplan-Meier survival curve from (duration, observed) spans.

    ``spans``: one row per subject with integer ``duration`` and
    ``observed`` (1 = the terminal event happened, 0 = censored).
    Risk sets come from a cumulative window over per-duration counts
    (|distinct durations| rows); the product-limit estimator is
    computed as exp(Σ ln(1 - d/n)) so both engines use the same
    transcendental path, rounded 6 dp. Output one row per duration
    with at least one death: (t, n_risk, d, s_hat).
    """
    per_t = spans.groupBy(F.col("duration").alias("t")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("observed").alias("d"),
    )
    total = spans.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.withColumn(
        "n_risk", F.lit(total) - F.sum("c").over(w) + F.col("c"))
    # a (d == n_risk) step drives S to exactly 0; keep it out of the
    # log (Spark's ln(0) is NULL) and pin S = 0 from there on
    curve = risk.withColumn(
        "hit", F.max(F.when(F.col("d") >= F.col("n_risk"), 1)
                     .otherwise(0)).over(w)
    ).withColumn(
        "lnsum", F.sum(
            F.when(F.col("d") < F.col("n_risk"),
                   F.log(1.0 - F.col("d") / F.col("n_risk")))
            .otherwise(0.0)).over(w)
    ).withColumn(
        "s_hat",
        F.when(F.col("hit") == 1, F.lit(0.0))
         .otherwise(F.round(F.exp(F.col("lnsum")), 6)))
    return (curve.where(F.col("d") > 0)
            .select("t", "n_risk", "d", "s_hat"))


def quantile_bins(df: DataFrame, value_col: str = "value",
                  k: int = 4) -> DataFrame:
    """Equi-depth discretizer (the relational QuantileDiscretizer):
    k-1 interior cuts at exact interpolated percentiles of
    ``value_col`` (6 dp-quantized), rows assigned bucket
    1 + #{cuts strictly below the value}, reported per
    (event_type, bucket) as [event_type, bucket, n, min_v, max_v,
    mean_v (6 dp)] — the feature-binning step of a training pipeline,
    value-checkable because the cut law is shared digit-for-digit
    with the SQL twin.

    Scale shape: ONE global percentile aggregate (at 100 TB the
    one-line swap is percentile_approx — mergeable t-digest), cuts
    broadcast onto the row stream, bucket assignment is a codegen
    CASE chain, and the report is one partially-aggregated group-by.
    Ties AT a cut go to the lower bucket (strict > comparisons, the
    same on both engines over identical 6 dp cut doubles).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    v = F.col(value_col)
    qs = [i / k for i in range(1, k)]
    cuts = df.agg(*[
        F.round(F.expr(f"percentile({value_col}, {q})"), 6)
        .alias(f"c{i}") for i, q in enumerate(qs)])
    bucket = F.lit(1)
    for i in range(len(qs)):
        bucket = bucket + F.when(v > F.col(f"c{i}"), 1).otherwise(0)
    return (df.crossJoin(F.broadcast(cuts))
            .select("event_type", v.alias("_v"),
                    bucket.cast("long").alias("bucket"))
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.min("_v"), 6).alias("min_v"),
                 F.round(F.max("_v"), 6).alias("max_v"),
                 F.round(F.avg("_v"), 6).alias("mean_v")))


def quantile_bins_sql(value_col: str = "value", k: int = 4) -> str:
    qs = [i / k for i in range(1, k)]
    cut_cols = ", ".join(
        f"round(quantile_cont({value_col}, {q}), 6) AS c{i}"
        for i, q in enumerate(qs))
    bucket = " + ".join(
        f"CASE WHEN {value_col} > c.c{i} THEN 1 ELSE 0 END"
        for i in range(len(qs)))
    return f"""
WITH cuts AS (
    SELECT {cut_cols} FROM events
), tagged AS (
    SELECT event_type, {value_col},
           CAST(1 + {bucket} AS BIGINT) AS bucket
    FROM events, cuts c
)
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min({value_col}), 6) AS min_v,
       round(max({value_col}), 6) AS max_v,
       round(avg({value_col}), 6) AS mean_v
FROM tagged GROUP BY 1, 2
""".strip()


def changepoint_binary(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Single change-point detection by binary segmentation: per
    event_type, the day split that maximizes the between-segment
    variance reduction

        gain(k) = n_l * n_r / n * (mean_l - mean_r)^2

    over the daily-mean series -> [event_type, split_day, n_left,
    n_right, mean_left, mean_right, gain] (6 dp). The classic first
    step of binary-segmentation/PELT change-point pipelines — CUSUM
    (e_cusum_drift) watches drift sequentially; this finds the
    single globally best break in hindsight.

    Cross-engine determinism: daily means are 6 dp-quantized at the
    stage boundary; the prefix sums then add the SAME values in the
    SAME day order on both engines (ordered window frames), so gains
    agree bit-for-bit before their own 6 dp rounding; argmax ties
    break on the earlier day.

    Scale shape: one (type, day) hash agg, per-type ordered window
    prefix sums (a type's series is days-long — thousands of rows,
    one task each; at 10^6 types that is the parallelism, not a
    bottleneck), one per-type argmax window.
    """
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(86_400_000_000)).cast("long")
    daily = (df.groupBy("event_type", day.alias("day"))
             .agg(F.round(F.avg(value_col), 6).alias("m")))
    wp = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("event_type")
    cur = (daily
           .withColumn("k", F.count(F.lit(1)).over(wp))
           .withColumn("s", F.sum("m").over(wp))
           .withColumn("n", F.count(F.lit(1)).over(wall))
           .withColumn("tot", F.sum("m").over(wall))
           .where(F.col("k") < F.col("n")))
    ml = F.col("s") / F.col("k")
    mr = (F.col("tot") - F.col("s")) / (F.col("n") - F.col("k"))
    gain = (F.col("k") * (F.col("n") - F.col("k")) / F.col("n")
            * (ml - mr) * (ml - mr))
    scored = cur.select(
        "event_type", F.col("day").alias("split_day"),
        F.col("k").cast("long").alias("n_left"),
        (F.col("n") - F.col("k")).cast("long").alias("n_right"),
        F.round(ml, 6).alias("mean_left"),
        F.round(mr, 6).alias("mean_right"),
        F.round(gain, 6).alias("gain"))
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("gain"), F.asc("split_day"))
    return (scored.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1).drop("rn"))


CHANGEPOINT_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
           round(avg(value), 6) AS m
    FROM events GROUP BY 1, 2
), cur AS (
    SELECT event_type, day,
           count(*) OVER wp AS k,
           sum(m) OVER wp AS s,
           count(*) OVER wall AS n,
           sum(m) OVER wall AS tot
    FROM daily
    WINDOW wp AS (PARTITION BY event_type ORDER BY day
                  ROWS UNBOUNDED PRECEDING),
           wall AS (PARTITION BY event_type)
), scored AS (
    SELECT event_type, day AS split_day,
           CAST(k AS BIGINT) AS n_left,
           CAST(n - k AS BIGINT) AS n_right,
           round(s / k, 6) AS mean_left,
           round((tot - s) / (n - k), 6) AS mean_right,
           round(k * (n - k) / CAST(n AS DOUBLE)
                 * (s / k - (tot - s) / (n - k))
                 * (s / k - (tot - s) / (n - k)), 6) AS gain
    FROM cur WHERE k < n
)
SELECT event_type, split_day, n_left, n_right,
       mean_left, mean_right, gain
FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY gain DESC, split_day ASC) AS rn
    FROM scored
) WHERE rn = 1
""".strip()
