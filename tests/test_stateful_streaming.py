"""Stateful sessionization stream vs a pure-pandas oracle.

The streaming operator carries only the open session between
micro-batches; driven to completion over the file source its emitted
set must equal batch sessionization of the same rows.
"""

import numpy as np
import pandas as pd

from adopt_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"
GAP_S = 1800


def pandas_sessions(events: pd.DataFrame) -> set[tuple]:
    out = set()
    for key, grp in events.groupby("event_type"):
        ts = np.sort(grp["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        brk = np.concatenate([[True], np.diff(ts) > GAP_S * 1_000_000])
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            m = ts[sid == s]
            fmt = lambda us: pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")
            out.add((key, int(s), fmt(m[0]), fmt(m[-1]), len(m)))
    return out


def test_sessionize_multibatch_matches_batch_oracle(spark, tmp_path):
    """maxFilesPerTrigger=1 over time-split files: sessions span
    micro-batches, the open session is re-emitted and extended, and
    the update-mode sink must still collapse to the batch oracle."""
    import os
    import time

    events = (spark.read.parquet(f"{SF}/events.parquet")
              .select("event_type", "ts").toPandas()
              .sort_values("ts").reset_index(drop=True))
    src = tmp_path / "src"
    src.mkdir()
    # 3 time-ordered slices; boundaries deliberately NOT on session
    # gaps, so open sessions cross micro-batches for every key
    cuts = [0, len(events) // 3, 2 * len(events) // 3, len(events)]
    for i in range(3):
        part = events.iloc[cuts[i]:cuts[i + 1]].copy()
        part["ts"] = part["ts"].astype("datetime64[us]")  # Spark can't read NANOS
        p = str(src / f"part-{i:02d}.parquet")
        part.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))  # strict mtime order
    got_rows = sessionize_stream(spark, SF, gap_seconds=GAP_S,
                                 source_dir=str(src),
                                 max_files_per_trigger=1).collect()
    got = {(r["event_type"], r["session_id"], r["session_start"],
            r["session_end"], r["n_events"]) for r in got_rows}
    assert got == pandas_sessions(events)


def test_sessionize_stream_matches_batch_oracle(spark):
    got_rows = sessionize_stream(spark, SF, gap_seconds=GAP_S).collect()
    got = {(r["event_type"], r["session_id"], r["session_start"],
            r["session_end"], r["n_events"]) for r in got_rows}
    events = spark.read.parquet(f"{SF}/events.parquet") \
                  .select("event_type", "ts").toPandas()
    assert got == pandas_sessions(events)
    # dense ids from 1 per key
    for key in events["event_type"].unique():
        sids = sorted(s for k, s, *_ in got if k == key)
        assert sids == list(range(1, len(sids) + 1))
