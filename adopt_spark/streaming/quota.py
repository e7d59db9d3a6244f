"""Streaming per-key quota enforcement (bounded top-k state).

Rate-limiting / data-cap semantics over the event stream: per
(user, time-bucket) only the first ``quota`` events BY EVENT TIME
are admitted; everything else is shed. The streaming form is a
bounded per-key top-k: ``applyInPandasWithState`` keyed by (user_id,
bucket_id), state = the quota smallest (ts, event_id) pairs seen so
far plus the running total — O(quota) per key, independent of stream
length, and a LATE-ARRIVING earlier event correctly displaces the
largest admitted one (no event-time-ordering assumption, unlike the
sessionizer's documented bound). Update-mode re-emissions collapse by
taking each key's last (= max n_total) version.

Admission is by (ts, event_id) lexicographic order — the total order
both engines share — so at stream completion the admitted set equals
the batch answer row_number() OVER (PARTITION BY user, bucket ORDER BY
ts, event_id) <= quota, which IS the oracle.

Scale shape: state is a fixed-size array per live key; the shuffle is
the stream's keyBy — identical to any keyed streaming aggregate. Hot
users are hot keys of the state store, not of a sort.
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

_OUT_SCHEMA = ("user_id long, bucket_id long, event_id long, "
               "admit_rank long, n_total long")
_STATE_SCHEMA = "n_total long, kept_ts array<long>, kept_ids array<long>"

_US = 1_000_000


def _quota_fn(quota: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        new_ts: list[np.ndarray] = []
        new_ids: list[np.ndarray] = []
        n_batch = 0
        for pdf in pdfs:
            if len(pdf):
                new_ts.append(pdf["ts"].astype("datetime64[us]")
                              .astype("int64").to_numpy())
                new_ids.append(pdf["event_id"].to_numpy(np.int64))
                n_batch += len(pdf)
        if state.exists:
            n_total, kept_ts, kept_ids = state.get
            new_ts.append(np.asarray(kept_ts, np.int64))
            new_ids.append(np.asarray(kept_ids, np.int64))
        else:
            n_total = 0
        n_total += n_batch
        ts = np.concatenate(new_ts) if new_ts else np.empty(0, np.int64)
        ids = np.concatenate(new_ids) if new_ids else np.empty(0, np.int64)
        order = np.lexsort((ids, ts))[:quota]
        ts, ids = ts[order], ids[order]
        state.update((int(n_total), ts.tolist(), ids.tolist()))
        uid, hid = key
        yield pd.DataFrame({
            "user_id": np.full(len(ids), uid, np.int64),
            "bucket_id": np.full(len(ids), hid, np.int64),
            "event_id": ids,
            "admit_rank": np.arange(1, len(ids) + 1, dtype=np.int64),
            "n_total": np.full(len(ids), n_total, np.int64),
        })

    return fn


def quota_stream(spark: SparkSession, sf_dir: str, quota: int = 3,
                 bucket_seconds: int = 86400,
                 source_dir: str | None = None,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Admit the first ``quota`` events per (user_id, time bucket) by
    (ts, event_id); returns the completed admitted set
    [user_id, bucket_id, event_id, admit_rank, n_total].

    bucket_id = floor(epoch_us / (bucket_seconds * 1e6)) — integer
    arithmetic both engines compute exactly (default: daily buckets,
    where the contract data actually EXCEEDS the quota so shedding is
    exercised). The collapse keeps each key's LAST emission (max
    n_total), then its rows.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    own_dir = source_dir is None
    if source_dir is None:
        source_dir = tempfile.mkdtemp(prefix="events_quota_")
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(source_dir, "events.parquet"))
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the
    # cast is a no-op reading and unix_micros matches DuckDB epoch_us
    stream = (reader.parquet(source_dir)
              .select("user_id", "event_id", "ts",
                      F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                              / (bucket_seconds * _US))
                      .cast("long").alias("bucket_id")))
    out = stream.groupBy("user_id", "bucket_id").applyInPandasWithState(
        _quota_fn(quota), _OUT_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
    name = f"quota_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window

    # collapse update-mode re-emissions: keep each key's LAST version
    # (n_total strictly increases per emission) via a window max —
    # a self-join on the memory view trips conflicting-reference
    # resolution, the window does not
    # materialize the collapsed result, then drop the per-call memory
    # sink table and the symlink dir we created — a gate run calls
    # this repeatedly and must not accumulate temp state
    try:
        raw = spark.table(name)
        w = Window.partitionBy("user_id", "bucket_id")
        final = (raw.withColumn("_mx", F.max("n_total").over(w))
                 .where(F.col("n_total") == F.col("_mx"))
                 .dropDuplicates(["user_id", "bucket_id", "event_id"])
                 .select("user_id", "bucket_id", "event_id", "admit_rank",
                         "n_total"))
        # spill the collapsed result to parquet instead of round-tripping
        # rows through the driver: the returned frame stays a distributed
        # scan (constant driver memory however many keys the stream has)
        out_dir = tempfile.mkdtemp(prefix="quota_out_")
        final.write.mode("overwrite").parquet(out_dir)
    finally:
        spark.catalog.dropTempView(name)
        if own_dir:
            import shutil

            shutil.rmtree(source_dir, ignore_errors=True)
    return spark.read.parquet(out_dir)


QUOTA_SQL_TMPL = """
WITH ev AS (
    SELECT user_id, event_id, ts,
           CAST(floor(epoch_us(ts) / ({bucket_seconds} * 1000000.0))
                AS BIGINT) AS bucket_id
    FROM events
), ranked AS (
    SELECT user_id, bucket_id, event_id,
           row_number() OVER (PARTITION BY user_id, bucket_id
                              ORDER BY ts, event_id) AS admit_rank,
           count(*) OVER (PARTITION BY user_id, bucket_id) AS n_total
    FROM ev
)
SELECT user_id, bucket_id, event_id,
       CAST(admit_rank AS BIGINT) AS admit_rank,
       CAST(n_total AS BIGINT) AS n_total
FROM ranked WHERE admit_rank <= {quota}
""".strip()
