"""Ordered-sequence funnel analysis over an event stream.

Classic product-analytics / training-pipeline telemetry operator:
given an ordered list of step event-types (e.g. view → click →
purchase), count how many users completed each prefix of the
sequence, where step i+1 must occur strictly AFTER the user's
earliest completion of step i, and (optionally) the whole sequence
must fit inside a time window anchored at the first step.

Semantics (the standard "earliest-completion" funnel): for each user
  t0 = min ts of an event of type steps[0]
  t_{i+1} = min ts of an event of type steps[i+1] with ts > t_i
            (and ts <= t0 + within, when a window is given)
The anchor is deliberately the user's EARLIEST step-0 event (not
"any qualifying start", which some funnel tools offer): with the
anchor fixed, taking the earliest valid completion at every later
step is optimal — it can only admit more users downstream — so the
per-step counts equal the exhaustive search under this anchoring.

Plan shape / scale: one aggregate per step, each keyed on the user
column — Spark hash-partial-aggregates map-side, then the step-k
frontier (≤ one row per user who reached step k, monotonically
shrinking) joins the events table on the user key. Every join and
groupBy reuses the same key, so AQE coalesces them onto one exchange
lineage; nothing is driver-resident and no window-over-whole-history
single-task pattern is involved (contrast interval.asof_join's
per-key windows). At 100 TB the events scan is filtered to the step
types before the first shuffle (predicate pushdown on event_type).

Reference parity: jxiw/ADOPT has no sequence operator; this extends
the event surface like sessionize/sliding-window do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within: str | None = None) -> DataFrame:
    """Per-step funnel counts.

    Returns DataFrame[step_idx int, step string, users bigint] with
    one row per step, users non-increasing in step_idx.

    ``within``: optional SQL interval literal body (e.g. ``"7 DAYS"``)
    bounding every later step against the user's step-0 time.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ev = (events.select(F.col(user_col).alias("u"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("et"))
          .where(F.col(type_col).isin(list(steps))))

    # step 0: earliest occurrence per user; t0 anchors the window
    frontier = (ev.where(F.col("et") == steps[0])
                .groupBy("u").agg(F.min("ts").alias("t"))
                .withColumn("t0", F.col("t")))
    counts = [frontier]
    for s in steps[1:]:
        nxt = ev.where(F.col("et") == s).alias("e")
        cond = (F.col("e.u") == F.col("f.u")) & (F.col("e.ts") > F.col("f.t"))
        if within is not None:
            cond &= F.col("e.ts") <= (
                F.col("f.t0") + F.expr(f"INTERVAL {within}"))
        frontier = (nxt.join(frontier.alias("f"), cond)
                    .groupBy(F.col("f.u").alias("u"), F.col("f.t0").alias("t0"))
                    .agg(F.min("e.ts").alias("t"))
                    .select("u", "t", "t0"))
        counts.append(frontier)

    out = None
    for i, (name, fr) in enumerate(zip(steps, counts)):
        row = fr.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(name).alias("step"), "users")
        out = row if out is None else out.unionAll(row)
    return out


def funnel_oracle_sql(steps: list[str], within: str | None = None,
                      table: str = "events", user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type") -> str:
    """The identical funnel as one ANSI-SQL chain for DuckDB."""
    ctes = [f"""s0 AS (
        SELECT {user_col} AS u, min({ts_col}) AS t, min({ts_col}) AS t0
        FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"""]
    for i, s in enumerate(steps[1:], start=1):
        win = (f" AND e.{ts_col} <= p.t0 + INTERVAL {within}"
               if within is not None else "")
        ctes.append(f"""s{i} AS (
        SELECT e.{user_col} AS u, min(e.{ts_col}) AS t, p.t0 AS t0
        FROM {table} e JOIN s{i - 1} p ON p.u = e.{user_col}
        WHERE e.{type_col} = '{s}' AND e.{ts_col} > p.t{win}
        GROUP BY 1, 3)""")
    selects = [
        f"SELECT CAST({i} AS INTEGER) AS step_idx, '{s}' AS step,"
        f" count(*) AS users FROM s{i}"
        for i, s in enumerate(steps)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
