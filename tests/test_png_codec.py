"""Pure-stdlib PNG codec + the closed-form media builders.

The decoder must reverse every scanline filter type and survive the
Spark pipeline (synthetic_png_media → decode_images) with stats that
match a direct numpy evaluation of the pixel law.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.multimodal import (
    decode_images, default_image_decode, synthetic_pcm_media,
    synthetic_png_media,
)
from adopt_spark.functions.png_codec import png_decode, png_encode


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (17, 23), (64, 64)])
def test_roundtrip_every_filter(filter_type, shape):
    rng = np.random.default_rng(filter_type * 100 + shape[0])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img, filter_type)), img)


def test_decode_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all")
    good = png_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(Exception):          # truncated IDAT -> zlib error
        png_decode(good[:40])


def test_default_decoder_routes_by_magic():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = png_encode(img, filter_type=4)
    assert np.array_equal(default_image_decode(png, 0, 0), img)  # header wins
    raw = bytes(range(16))
    assert default_image_decode(raw, 4, 4).shape == (4, 4)       # fake path


def _law_pixels(k: int) -> np.ndarray:
    w, h = k % 23 + 8, k % 17 + 8
    i = np.arange(w * h, dtype=np.int64)
    return ((k * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w)


def test_synthetic_png_media_decodes_to_the_law(spark):
    keys = spark.createDataFrame([(k,) for k in range(40)], "media_id long")
    media = synthetic_png_media(keys)
    rows = media.collect()
    assert {r["media_id"] % 5 for r in rows} == {0, 1, 2, 3, 4}  # all filters
    for r in rows:
        img = png_decode(bytes(r["payload"]))
        assert np.array_equal(img, _law_pixels(r["media_id"]))
        assert img.shape == (r["meta"]["height"], r["meta"]["width"])


def test_png_pipeline_stats_match_numpy(spark):
    keys = spark.createDataFrame([(k,) for k in range(25)], "media_id long")
    out = {r["media_id"]: r for r in
           decode_images(synthetic_png_media(keys)).collect()}
    for k in range(25):
        img = _law_pixels(k)
        assert abs(out[k]["mean_px"] - img.mean()) < 1e-9
        assert abs(out[k]["std_px"] - img.std()) < 1e-9
    # stable across partitioning
    a = {r["media_id"]: r["mean_px"] for r in
         decode_images(synthetic_png_media(keys.repartition(2))).collect()}
    b = {r["media_id"]: r["mean_px"] for r in
         decode_images(synthetic_png_media(keys.repartition(7))).collect()}
    assert a == b


def test_synthetic_pcm_media_matches_law(spark):
    from adopt_spark.functions.multimodal import audio_features

    keys = spark.createDataFrame([(k,) for k in range(15)], "media_id long")
    out = {r["media_id"]: r for r in
           audio_features(synthetic_pcm_media(keys)).collect()}
    for k in range(15):
        n = k % 512 + 256
        sr = [8000, 16000, 44100][k % 3]
        wave = ((k * 13 + np.arange(n) * 11) % 256).astype(np.int16) - 128
        assert abs(out[k]["duration_s"] - n / sr) < 1e-12
        assert abs(out[k]["rms"] - np.sqrt(np.mean(wave.astype(float) ** 2))) < 1e-9
        assert out[k]["peak"] == int(np.abs(wave).max())


# ---- RGB truecolor (color type 2) ----

def _rgb_img(h=13, w=11, seed=3):
    x, px = seed, []
    for _ in range(h * w * 3):
        x = (x * 1103515245 + 12345) % (1 << 31)
        px.append(x % 256)
    return np.array(px, dtype=np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(ft):
    img = _rgb_img()
    back = png_decode(png_encode(img, filter_type=ft))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_rgb_header_declares_truecolor():
    data = png_encode(_rgb_img(4, 5))
    # IHDR payload starts at byte 16; color type is its 10th byte
    assert data[16 + 9] == 2
    # a grayscale encode still declares color type 0
    assert png_encode(np.zeros((4, 5), dtype=np.uint8))[16 + 9] == 0


def test_rgb_filters_are_bytewise_with_bpp_offset():
    # a horizontal color gradient: Sub filter must predict from the
    # SAME channel 3 bytes back, not the adjacent byte
    img = np.zeros((2, 8, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(8, dtype=np.uint8) * 30      # red ramp
    img[:, :, 2] = 255 - np.arange(8, dtype=np.uint8) * 9  # blue fall
    for ft in (1, 3, 4):
        assert np.array_equal(png_decode(png_encode(img, ft)), img)


def test_rgb_rejects_bad_channel_count():
    with pytest.raises(ValueError):
        png_encode(np.zeros((4, 4, 4), dtype=np.uint8))


def test_gray_outputs_unchanged_format():
    # regression: the RGB extension must not alter grayscale bytes
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    assert np.array_equal(png_decode(png_encode(img, 4)), img)
