"""Multimodal plumbing: schema, batch shape, sha invariant, stub gating."""

import hashlib

import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.multimodal import (
    decode_images, frame_sample, require_real_codecs, synthetic_media,
)


def test_decode_pipeline_runs_and_preserves_sha(spark):
    media = synthetic_media(spark, n=40, seed=42)
    feats = decode_images(media)
    rows = feats.collect()
    assert len(rows) == 40
    src = {r["media_id"]: hashlib.sha256(bytes(r["payload"])).hexdigest()
           for r in media.collect()}
    for r in rows:
        assert r["sha"] == src[r["media_id"]]
        assert 0 <= r["mean_px"] <= 255
        assert len(r["hist"]) == 16
        assert sum(r["hist"]) > 0


def test_decode_deterministic_across_partitioning(spark):
    media = synthetic_media(spark, n=20, seed=7)
    a = {r["media_id"]: (r["mean_px"], list(r["hist"]))
         for r in decode_images(media.repartition(2)).collect()}
    b = {r["media_id"]: (r["mean_px"], list(r["hist"]))
         for r in decode_images(media.repartition(8)).collect()}
    assert a == b


def test_frame_sample(spark):
    media = synthetic_media(spark, n=5, seed=1, kind="video")
    media = media.withColumn(
        "meta", F.struct(F.col("meta.width"), F.col("meta.height"),
                         F.col("meta.sample_rate"), F.lit(25).alias("n_frames"))
    )
    frames = frame_sample(media, every=10)
    got = {(r["media_id"], r["frame_idx"]) for r in frames.collect()}
    assert got == {(i, f) for i in range(5) for f in (0, 10, 20)}


def test_real_codec_gate():
    with pytest.raises(NotImplementedError):
        require_real_codecs()
