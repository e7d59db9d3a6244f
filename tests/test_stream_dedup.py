"""Streaming dedup: duplicates arriving in LATER micro-batches must
be suppressed by carried state, not just within-batch distinct."""

from pyspark.sql import functions as F

from adopt_spark.streaming.dedup_stream import dedup_events_stream

SF = "/root/testdata/sf0.001"


def test_stream_dedup_collapses_replicas(spark):
    base = (spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
    exp = {(r["event_type"], r["n"]) for r in base.collect()}
    for copies in (2, 3):
        got = {(r["event_type"], r["n"])
               for r in dedup_events_stream(spark, SF, copies=copies).collect()}
        assert got == exp


def test_stream_ewma_multibatch_matches_closed_form(spark, tmp_path):
    """The recursion crosses micro-batches and still equals the
    closed-form weighted sum."""
    import os
    import time

    import pandas as pd

    from adopt_spark.streaming.ewma import ewma_stream

    base = pd.Timestamp("2024-01-01")
    vals = [4.0, 8.0, 2.0, 6.0, 10.0]
    rows = pd.DataFrame({
        "event_id": range(1, 6),
        "ts": [base + pd.Timedelta(minutes=m) for m in range(5)],
        "user_id": [1] * 5,
        "value": vals,
    })
    src = tmp_path / "src"
    src.mkdir()
    for i, sl in enumerate((rows.iloc[:2], rows.iloc[2:])):
        part = sl.copy()
        part["ts"] = part["ts"].astype("datetime64[us]")
        p = str(src / f"part-{i:02d}.parquet")
        part.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))
    got = ewma_stream(spark, "unused", source_dir=str(src),
                      max_files_per_trigger=1).collect()
    assert len(got) == 1
    e = vals[0]
    for x in vals[1:]:
        e = 0.5 * x + 0.5 * e
    assert got[0].n_events == 5
    assert got[0].ewma == round(e, 6)
