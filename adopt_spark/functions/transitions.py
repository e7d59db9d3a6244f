"""First-order Markov transition matrix over an event stream.

Product-analytics / telemetry operator: for every user, order events
by (ts, event_id) and count consecutive event-type pairs
(src -> dst); normalize per source type into transition probabilities.
The deterministic (ts, event_id) sort key makes the result
parallelism- and engine-independent even under timestamp ties.

Plan shape / scale: one window (lead over user partitions — per-user
history bounded, the same assumption sessionize documents), one
groupBy(src, dst) with map-side partial aggregation, and the per-src
normalizer rides a second aggregate on the ALREADY-REDUCED pair-count
frame (|types|^2 rows), so the big table is shuffled exactly once.
Probabilities are rounded to 6 dp on both engines — counts, not
floats, carry the correctness.

Reference parity: jxiw/ADOPT has no event-sequence surface; this
extends the events family (funnel, sessionize, retention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def event_transitions(events: DataFrame,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """Returns DataFrame[src string, dst string, n bigint, p double]
    — one row per observed transition, p = n / sum(n per src),
    rounded to 6 dp."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(F.col(type_col).alias("src"),
                      F.lead(type_col).over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("tot"))
    return (pairs.join(tot, "src")
            .select("src", "dst", "n",
                    F.round(F.col("n") / F.col("tot"), 6).alias("p")))


def transitions_oracle_sql(table: str = "events",
                           user_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id") -> str:
    """The identical computation for DuckDB."""
    return f"""WITH pairs AS (
    SELECT src, dst, count(*) AS n FROM (
        SELECT {type_col} AS src,
               lead({type_col}) OVER (PARTITION BY {user_col}
                                      ORDER BY {ts_col}, {id_col}) AS dst
        FROM {table}
    ) WHERE dst IS NOT NULL GROUP BY src, dst
), tot AS (
    SELECT src, sum(n) AS tot FROM pairs GROUP BY src
)
SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n,
       round(CAST(p.n AS DOUBLE) / tot.tot, 6) AS p
FROM pairs p JOIN tot USING (src)"""
