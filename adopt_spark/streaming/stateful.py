"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming (SURVEY.md §2.9); this is the
north-of-reference stateful pattern the toolbox needs:
``applyInPandasWithState`` with **bounded per-key state** — only the
open session (start, last-event time, count, next session id) is
carried between micro-batches, never the event history, so state size
is O(keys) regardless of stream length. Finalized sessions are emitted
as they close; the open session is re-emitted (updated) each batch.

Semantics: per key, events sorted by event time; a gap greater than
``gap_seconds`` between consecutive events starts a new session.
Session ids are dense from 1 per key. All gap comparisons are in
integer epoch-microseconds so the batch SQL oracle (lag + cumulative
sum of gap breaks) matches bit-for-bit.

Driven to completion over a file source for test/oracle parity — at
completion the emitted set equals batch sessionization of the same
rows, which IS the correctness check (same pattern as windowed.py).

Out-of-order bound (the watermark assumption every bounded-state
sessionizer carries): late events are folded into the OPEN session
(whose last-event time never regresses), but events arriving after
their session has already closed cannot reopen it — the event list
is not retained. Feed batches in event-time order (file source sorted
by mtime, as the tests do) or put an upstream watermark in front.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = ("event_type string, session_id long, session_start string, "
               "session_end string, n_events long")
_STATE_SCHEMA = "next_sid long, open_start long, open_last long, open_n long"

_US = 1_000_000


def _fmt(us: np.ndarray) -> pd.Series:
    return pd.Series(us.astype("datetime64[us]")).dt.strftime("%Y-%m-%d %H:%M:%S")


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ts = np.sort(np.concatenate(
            [pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
             for pdf in pdfs] or [np.empty(0, np.int64)]))
        if len(ts) == 0:
            return
        if state.exists:
            open_sid, open_start, open_last, open_n = state.get
        else:
            # no open session yet: impossible last ts forces a break at ts[0]
            open_sid, open_start, open_last, open_n = 0, ts[0], ts[0] - gap_us - 1, 0
        # break before each event whose gap from its predecessor (or the
        # carried open session's last event) exceeds the gap. The
        # predecessor chain is clamped to the open session's last-event
        # time: a late (ts <= open_last) event folds into the open
        # session, and the event AFTER it must be gap-tested against the
        # session's true max, not the late event — otherwise one late
        # row in a batch spuriously splits the session. No-op for the
        # sentinel/no-state case and for post-break events (both have
        # predecessors >= open_last already).
        prev = np.maximum(np.concatenate([[open_last], ts[:-1]]), open_last)
        brk = (ts - prev) > gap_us
        sid = int(open_sid) + np.cumsum(brk)     # non-break head extends open_sid
        starts = np.where(brk, ts, np.int64(open_start))
        # per-session aggregation (sid ascending because ts sorted)
        u, first = np.unique(sid, return_index=True)
        bounds = np.append(first, len(ts))
        s_start = starts[first]                  # break ts, or carried open_start
        s_end = ts[bounds[1:] - 1]
        s_n = bounds[1:] - bounds[:-1]
        if not brk[0]:
            s_n[0] += open_n
            # late (out-of-order) events must not regress the open
            # session's last-event time — the gap test and the emitted
            # session_end both key off the true max
            if int(u[0]) == int(open_sid) and state.exists:
                s_end[0] = max(int(s_end[0]), int(open_last))
        state.update((int(u[-1]), int(s_start[-1]), int(s_end[-1]),
                      int(s_n[-1])))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(u),
            "session_id": u.astype("int64"),
            "session_start": _fmt(s_start),
            "session_end": _fmt(s_end),
            "n_events": s_n.astype("int64"),
        })

    return fn


def sessionize_stream(spark: SparkSession, sf_dir: str,
                      gap_seconds: int = 1800,
                      source_dir: str | None = None,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Gap-sessionize the events stream per event_type; returns the
    completed result [event_type, session_id, session_start,
    session_end, n_events].

    Update-mode semantics: the memory sink APPENDS one row per
    (key, session) emission per micro-batch, and the open session is
    re-emitted (updated) whenever it extends — so after more than one
    micro-batch the raw sink holds stale earlier versions of extended
    sessions. The read below collapses them: sessions only ever grow,
    so max(session_end)/max(n_events) per (event_type, session_id) is
    exactly the last emission (session_start is carried unchanged).
    Pinned by the multi-batch test (maxFilesPerTrigger=1 over files
    whose sessions span micro-batches).

    ``source_dir``: stream from an existing directory of parquet files
    (multi-batch tests) instead of the single sf_dir/events.parquet.
    """
    if source_dir is None:
        source_dir = tempfile.mkdtemp(prefix="events_sess_")
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(source_dir, "events.parquet"))
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir).select("event_type", "ts")
    out = stream.groupBy("event_type").applyInPandasWithState(
        _session_fn(gap_seconds), _OUT_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type", "session_id")
        .agg(F.max("session_start").alias("session_start"),
             F.max("session_end").alias("session_end"),
             F.max("n_events").alias("n_events"))
    )
