"""Structured Streaming restart recovery: a stopped query resumed on
the SAME checkpoint must consume exactly the unseen files — no loss,
no refold (round-3 session-16)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adopt_spark.streaming.graph_stream import streaming_cc_resumable


def _write_batches(spark, tmp_path):
    """4 edge files: two chains that the last file merges."""
    batches = [
        [(0, 1), (1, 2)],
        [(10, 11), (11, 12)],
        [(2, 3)],
        [(3, 10)],          # merges both chains into component 0
    ]
    paths = []
    for i, rows in enumerate(batches):
        p = str(tmp_path / f"in{i}")
        spark.createDataFrame(rows, "sid long, tid long") \
             .coalesce(1).write.mode("overwrite").parquet(p)
        import glob
        paths.append(glob.glob(os.path.join(p, "part-*.parquet"))[0])
    return batches, paths


def test_stream_restart_consumes_only_unseen_files(spark, tmp_path):
    batches, paths = _write_batches(spark, tmp_path)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    labels_dir = str(tmp_path / "labels")

    # run 1: only the first two files exist; query drains and stops
    lab1 = streaming_cc_resumable(spark, src, ckpt, labels_dir,
                                  files=paths[:2])
    got1 = {r.v: r.component for r in lab1.collect()}
    assert got1 == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}

    # run 2: two more files arrive; the SAME checkpoint resumes.
    lab2 = streaming_cc_resumable(spark, src, ckpt, labels_dir,
                                  files=paths[2:])
    got2 = {r.v: r.component for r in lab2.collect()}
    # all 8 vertices in one component named by the global min id —
    # correct only if runs 1 and 2 together folded EVERY batch exactly
    # once (a refold of files 1-2 would also pass CC's idempotent
    # merge, so additionally assert the offset log's batch count)
    assert got2 == {v: 0 for v in [0, 1, 2, 3, 10, 11, 12]}

    # Spark's offset log: run 1 wrote offsets 0..1, run 2 added 2..3.
    offsets = sorted(os.listdir(os.path.join(ckpt, "offsets")))
    assert [o for o in offsets if not o.startswith(".")] == \
        ["0", "1", "2", "3"]

    # run 3: nothing new -> no additional offsets, labels unchanged
    lab3 = streaming_cc_resumable(spark, src, ckpt, labels_dir)
    assert {r.v: r.component for r in lab3.collect()} == got2
    offsets3 = [o for o in
                sorted(os.listdir(os.path.join(ckpt, "offsets")))
                if not o.startswith(".")]
    assert offsets3 == ["0", "1", "2", "3"]


def test_stream_restart_empty_source_returns_empty(spark, tmp_path):
    out = streaming_cc_resumable(
        spark, str(tmp_path / "s"), str(tmp_path / "c"),
        str(tmp_path / "l"))
    assert out.count() == 0
    assert out.columns == ["v", "component"]
