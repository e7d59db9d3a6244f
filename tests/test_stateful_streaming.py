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


def test_sessionize_late_events_fold_into_open_session(spark, tmp_path):
    """In-batch late events must not split the open session: an event
    whose gap from the open session's LAST-EVENT MAX is within the gap
    must extend it, even when its sorted in-batch predecessor is a late
    (earlier-than-open_last) event that makes the naive pairwise gap
    look too large."""
    import os
    import time

    def mk(path, ts_list):
        df = pd.DataFrame({"event_type": ["k"] * len(ts_list),
                           "ts": pd.to_datetime(ts_list)})
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(path)

    src = tmp_path / "late"
    src.mkdir()
    # batch 0: open session start 10:00, last 10:20 (gap = 30 min)
    mk(str(src / "b0.parquet"), ["2024-01-01 10:00:00", "2024-01-01 10:20:00"])
    # batch 1: TWO late events (10:05, 10:07 <= open_last) + 10:40
    # (25 min from the session max 10:20 -> extends; 33 min from its
    # in-batch predecessor 10:07 -> the unclamped chain would split)
    # + 11:30 (50 min from 10:40 -> genuinely new session)
    mk(str(src / "b1.parquet"), ["2024-01-01 10:05:00", "2024-01-01 10:07:00",
                                 "2024-01-01 10:40:00", "2024-01-01 11:30:00"])
    for i, f in enumerate(sorted(os.listdir(src))):
        os.utime(str(src / f), (time.time() + i, time.time() + i))
    got_rows = sessionize_stream(spark, SF, gap_seconds=GAP_S,
                                 source_dir=str(src),
                                 max_files_per_trigger=1).collect()
    got = {(r["event_type"], r["session_id"], r["session_start"],
            r["session_end"], r["n_events"]) for r in got_rows}
    assert got == {
        ("k", 1, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 5),
        ("k", 2, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1),
    }


def test_append_mode_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation: windows emit once after the
    watermark passes, and events later than the watermark are DROPPED
    (the production late-data contract)."""
    import os
    import time

    from adopt_spark.streaming.windowed import windowed_counts_append_stream

    def mk(path, rows):
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value", "props"])
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        df.to_parquet(path)

    src = tmp_path / "wsrc"
    src.mkdir()
    # Eviction happens at END of the batch where the watermark passes a
    # window's end, AFTER that batch's input merges — so a droppable
    # late row must arrive at least two batches after its window's
    # data (empirically traced; Spark counts it in
    # numRowsDroppedByWatermark).
    # batch 0: two H0 events + one 02:00 event (watermark -> 01:30)
    mk(str(src / "f0.parquet"), [
        (0, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
        (1, "2024-01-01 00:20:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 02:00:00", 1, "click", 1.0, "{}"),
    ])
    # batch 1: 03:30 (watermark -> 03:00; evicts+emits H0 and H2)
    mk(str(src / "f1.parquet"), [
        (3, "2024-01-01 03:30:00", 1, "click", 1.0, "{}"),
    ])
    # batch 2: LATE 00:40 (H0 already closed -> DROPPED) + 04:30
    mk(str(src / "f2.parquet"), [
        (4, "2024-01-01 00:40:00", 1, "click", 1.0, "{}"),
        (5, "2024-01-01 04:30:00", 1, "click", 1.0, "{}"),
    ])
    for i, f in enumerate(sorted(os.listdir(src))):
        os.utime(str(src / f), (time.time() + i, time.time() + i))
    out = {(r["window_start"], r["n"]) for r in
           windowed_counts_append_stream(spark, str(src)).collect()}
    # H0 once with 2 (late 00:40 dropped, NOT 3); H2 and H3 emitted;
    # H4 never finalizes (watermark stops at 04:00)
    assert out == {("2024-01-01 00:00:00", 2),
                   ("2024-01-01 02:00:00", 1),
                   ("2024-01-01 03:00:00", 1)}


def test_windowed_topk_stream_structure_and_batch_parity(spark):
    """Streaming hourly top-3: ranks are 1..k per window with the
    deterministic (n desc, user_id asc) tie-break, and the whole
    result equals the batch computation over the same parquet."""
    from pyspark.sql import Window, functions as F

    from adopt_spark.streaming.windowed import windowed_topk_stream

    sf = "/root/testdata/sf0.001"
    rows = windowed_topk_stream(spark, sf, k=3).collect()
    per_w: dict[str, list] = {}
    for r in rows:
        per_w.setdefault(r.window_start, []).append(r)
    for w, rs in per_w.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        key = [(-r.n, r.user_id) for r in rs]
        assert key == sorted(key)

    batch = (spark.read.parquet(f"{sf}/events.parquet")
             .groupBy(F.date_format(F.date_trunc("hour",
                      F.col("ts").cast("timestamp")),
                      "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                      "user_id")
             .agg(F.count(F.lit(1)).alias("n")))
    rw = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("user_id"))
    want = {(r.window_start, r.user_id, r.n, r.rank)
            for r in batch.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= 3).collect()}
    assert {(r.window_start, r.user_id, r.n, r.rank) for r in rows} == want
