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


def test_audio_features_deterministic_and_oracle(spark):
    from adopt_spark.functions.multimodal import audio_features

    media = synthetic_media(spark, n=12, seed=3, kind="audio")
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    assert len(out) == 12
    # numpy oracle on the same deterministic payloads
    import hashlib

    import numpy as np
    for row in media.collect():
        wave = np.frombuffer(bytes(row["payload"]), dtype=np.uint8).astype(np.int16) - 128
        r = out[row["media_id"]]
        assert r["sha"] == hashlib.sha256(bytes(row["payload"])).hexdigest()
        assert abs(r["duration_s"] - wave.size / row["meta"]["sample_rate"]) < 1e-9
        assert abs(r["rms"] - float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))) < 1e-9
        assert r["zero_crossings"] == int(np.count_nonzero(np.diff(np.signbit(wave))))
        assert r["peak"] == int(np.abs(wave).max())
    # parallelism-independent
    again = {r["media_id"]: (r["rms"], r["zero_crossings"])
             for r in audio_features(media.repartition(5)).collect()}
    assert again == {k: (v["rms"], v["zero_crossings"]) for k, v in out.items()}


def test_audio_features_injectable_decoder(spark):
    from adopt_spark.functions.multimodal import audio_features

    media = synthetic_media(spark, n=3, seed=3, kind="audio")
    silent = lambda payload, sr: __import__("numpy").zeros(4, dtype="int16")
    rows = audio_features(media, decoder=silent).collect()
    assert all(r["rms"] == 0.0 and r["peak"] == 0 for r in rows)


def test_audio_silence_python_twin(spark):
    """Frame energies + run report vs a numpy/python twin on the
    synthetic WAV law."""
    import numpy as np

    from adopt_spark.functions.multimodal import (
        audio_frame_energy, silence_report, synthetic_wav_media,
    )

    keys = spark.createDataFrame([(k,) for k in (0, 1, 2, 7, 100, 511)],
                                 "media_id long")
    media = synthetic_wav_media(keys)
    got = {r.media_id: (r.n_frames, r.n_silent, r.n_runs, r.longest_run,
                        r.lead_silence, r.trail_silence)
           for r in silence_report(audio_frame_energy(media, frame=16),
                                   threshold=64).collect()}

    for k in (0, 1, 2, 7, 100, 511):
        n = k % 512 + 256
        i = np.arange(n)
        v = (k * 13 + i * 11) % 256 - 128
        n_fr = (n + 15) // 16
        sil = []
        for f in range(n_fr):
            blk = v[f * 16:(f + 1) * 16].astype(np.int64)
            sil.append(int((blk ** 2).sum()) <= len(blk) * 64 * 64)
        runs = []
        j = 0
        while j < n_fr:
            if sil[j]:
                j0 = j
                while j < n_fr and sil[j]:
                    j += 1
                runs.append((j0, j - j0))
            else:
                j += 1
        exp = (n_fr, sum(sil), len(runs),
               max((ln for _, ln in runs), default=0),
               next((ln for f0, ln in runs if f0 == 0), 0),
               next((ln for f0, ln in runs if f0 + ln == n_fr), 0))
        assert got[k] == exp, k


def test_audio_silence_crafted_lead_trail(spark):
    """Injectable decoder: silence–loud–silence must report lead and
    trail runs exactly; an all-loud clip reports zeros."""
    import numpy as np

    from adopt_spark.functions.multimodal import (
        audio_frame_energy, silence_report,
    )

    def decoder(payload, sr):
        k = payload[0]
        if k == 1:   # 4 silent frames, 4 loud, 2 silent (frame=4)
            return np.concatenate([np.zeros(16), np.full(16, 100),
                                   np.zeros(8)]).astype(np.int16)
        return np.full(40, 100, dtype=np.int16)  # all loud

    media = spark.createDataFrame(
        [(1, "audio", bytes([1]), {"sample_rate": 8000}),
         (2, "audio", bytes([2]), {"sample_rate": 8000})],
        "media_id long, kind string, payload binary, "
        "meta map<string,int>")
    rep = {r.media_id: r for r in silence_report(
        audio_frame_energy(media, frame=4, decoder=decoder),
        threshold=10).collect()}
    r1 = rep[1]
    assert (r1.n_frames, r1.n_silent, r1.n_runs) == (10, 6, 2)
    assert (r1.longest_run, r1.lead_silence, r1.trail_silence) == (4, 4, 2)
    r2 = rep[2]
    assert (r2.n_silent, r2.n_runs, r2.lead_silence, r2.trail_silence) \
        == (0, 0, 0, 0)


def test_image_thumbnails_law_and_roundtrip(spark):
    """Thumbnail pixels equal the nearest-neighbor sample of the
    closed-form source law; the in-kernel PNG re-encode roundtrip
    ran for every image (a mismatch raises)."""
    import numpy as np
    from pyspark.sql import functions as F

    from adopt_spark.functions.multimodal import (
        image_thumbnails, synthetic_png_media)

    keys = spark.range(0, 40).select(F.col("id").alias("media_id"))
    got = {(r.media_id, r.r, r.c): r.px
           for r in image_thumbnails(synthetic_png_media(keys),
                                     size=4).collect()}
    assert len(got) == 40 * 16
    for k in range(40):
        w, h = k % 23 + 8, k % 17 + 8
        for r in range(4):
            for c in range(4):
                src = (r * h // 4) * w + (c * w // 4)
                assert got[(k, r, c)] == (k * 31 + src * 7) % 256


def test_image_thumbnails_detects_broken_decoder(spark):
    """A decoder that lies about pixels still roundtrips (encode of
    the wrong pixels decodes to the same wrong pixels), so the LAW
    check is what catches it — pin that the output actually differs
    under a corrupted decoder."""
    import numpy as np
    from pyspark.sql import functions as F

    from adopt_spark.functions.multimodal import (
        image_thumbnails, synthetic_png_media)

    def bad(payload, width, height):
        from adopt_spark.functions.multimodal import default_image_decode
        img = default_image_decode(payload, width, height)
        return (img + 1) % 256

    keys = spark.range(0, 5).select(F.col("id").alias("media_id"))
    media = synthetic_png_media(keys)
    good = {(r.media_id, r.r, r.c): r.px
            for r in image_thumbnails(media, size=4).collect()}
    off = {(r.media_id, r.r, r.c): r.px
           for r in image_thumbnails(media, size=4,
                                     decoder=bad).collect()}
    assert all(off[k] == (good[k] + 1) % 256 for k in good)


def test_rgb_decode_features_follow_the_channel_law(spark):
    from adopt_spark.functions.multimodal import (
        decode_rgb_features, synthetic_rgb_media,
    )

    keys = spark.createDataFrame([(k,) for k in (0, 3, 7, 12, 104)],
                                 "media_id long")
    out = {r.media_id: r for r in
           decode_rgb_features(synthetic_rgb_media(keys)).collect()}
    import numpy as np
    for k in (0, 3, 7, 12, 104):
        w, h = k % 23 + 8, k % 17 + 8
        i = np.repeat(np.arange(w * h), 3)
        c = np.tile(np.arange(3), w * h)
        px = (k * 31 + i * 7 + c * 11) % 256
        img = px.reshape(h, w, 3)
        r = out[k]
        assert r.mean_r == pytest.approx(img[:, :, 0].mean(), abs=1e-9)
        assert r.mean_g == pytest.approx(img[:, :, 1].mean(), abs=1e-9)
        assert r.mean_b == pytest.approx(img[:, :, 2].mean(), abs=1e-9)
        assert r.std_px == pytest.approx(img.std(), abs=1e-9)
        assert len(r.sha) == 64
