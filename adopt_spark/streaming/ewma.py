"""Streaming per-key exponentially-weighted moving average.

The online-smoothing primitive (anomaly baselines, rate estimators):
per user, over events in event-time order,

    e_1 = x_1 ;   e_t = alpha * x_t + (1 - alpha) * e_{t-1}

with alpha = 0.5. State per key is THREE scalars (current ewma, last
event-time key, count) — O(keys) total, the recursion never re-reads
history. At completion the stream's answer equals the batch closed
form e_n = sum_i w_i x_i with w_i = alpha(1-alpha)^{n-i} (and the
first term's alpha dropped), which the DuckDB twin computes directly
— pow(0.5, k) on integer k is exact on every engine (powers of two
are exact doubles), so the only cross-engine slack is float
summation order, absorbed by the 6 dp quantization.

Event-time-order caveat: same as the sessionizer — batches must
arrive in event-time order (file source sorted by mtime); a late
event cannot be woven back into the recursion.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, n_events long, ewma double"
_STATE_SCHEMA = "ewma double, n long"

ALPHA = 0.5


def _ewma_fn():
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        df = pd.concat(parts).sort_values(["us", "event_id"])
        xs = df["value"].to_numpy(np.float64)
        if state.exists:
            e, n = state.get
        else:
            e, n = float(xs[0]), 1
            xs = xs[1:]
        for x in xs:
            e = ALPHA * float(x) + (1 - ALPHA) * e
            n += 1
        state.update((float(e), int(n)))
        (uid,) = key
        yield pd.DataFrame({"user_id": [uid], "n_events": [n],
                            "ewma": [e]})

    return fn


def ewma_stream(spark: SparkSession, sf_dir: str,
                source_dir: str | None = None,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """Final per-user EWMA over the event stream ->
    [user_id, n_events, ewma (6 dp)]; update-mode re-emissions
    collapse by max n_events (the recursion only ever extends)."""
    own_dir = source_dir is None
    if source_dir is None:
        source_dir = tempfile.mkdtemp(prefix="events_ewma_")
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(source_dir, "events.parquet"))
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(source_dir)
              .select("user_id", "event_id", "value",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      .alias("us")))
    out = stream.groupBy("user_id").applyInPandasWithState(
        _ewma_fn(), _OUT_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window

    # materialize the collapsed result, then drop the per-call memory
    # sink table and the symlink dir we created — a gate run calls
    # this repeatedly and must not accumulate temp state
    try:
        raw = spark.table(name)
        w = Window.partitionBy("user_id")
        final = (raw.withColumn("_mx", F.max("n_events").over(w))
                 .where(F.col("n_events") == F.col("_mx"))
                 .dropDuplicates(["user_id"])
                 .select("user_id", "n_events",
                         F.round("ewma", 6).alias("ewma")))
        # spill the collapsed result to parquet instead of round-tripping
        # rows through the driver: the returned frame stays a distributed
        # scan (constant driver memory however many users the stream has)
        out_dir = tempfile.mkdtemp(prefix="ewma_out_")
        final.write.mode("overwrite").parquet(out_dir)
    finally:
        spark.catalog.dropTempView(name)
        if own_dir:
            import shutil

            shutil.rmtree(source_dir, ignore_errors=True)
    return spark.read.parquet(out_dir)


EWMA_STREAM_SQL = """
WITH ranked AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(sum(value * CASE WHEN rn = 1 THEN power(0.5, n - 1)
                              ELSE power(0.5, n - rn + 1) END), 6)
           AS ewma
FROM ranked GROUP BY user_id, n
""".strip()
