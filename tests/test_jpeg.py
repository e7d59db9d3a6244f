"""Baseline JPEG codec (functions/jpeg_codec.py) vs spec properties
and the closed-form constant-block law; no Spark needed."""

import numpy as np
import pytest

from adopt_spark.functions.jpeg_codec import (
    QUANT_LUM, ZIGZAG, _T, jpeg_decode, jpeg_encode, quality_scale,
)


def test_dct_matrix_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)


def test_zigzag_is_spec_order():
    # T.81 Figure A.6 first entries
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10,
                                 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))


def test_quality_scale_50_is_annex_k():
    assert (quality_scale(QUANT_LUM, 50) == QUANT_LUM).all()
    assert quality_scale(QUANT_LUM, 100).max() == 1
    with pytest.raises(ValueError, match="quality"):
        quality_scale(QUANT_LUM, 0)


@pytest.mark.parametrize("v", [0, 1, 17, 128, 200, 254, 255])
def test_constant_block_law(v):
    """Constant gray decodes to clip(floor((v-128)/2+0.5)*2+128) at
    quality 50 — the closed form the DuckDB oracle evaluates."""
    img = np.full((16, 24), v, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=50))
    want = int(np.clip(np.floor((v - 128) / 2.0 + 0.5) * 2 + 128, 0, 255))
    assert dec.shape == img.shape
    assert int(dec.min()) == int(dec.max()) == want


def test_even_values_roundtrip_exact():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 128, size=12) * 2
    img = np.repeat(np.repeat(vals.reshape(3, 4), 8, 0), 8, 1).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=50))
    assert (dec == img).all()


def test_smooth_image_bounded_error():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 56)).astype(float)
    for _ in range(3):
        img = np.pad(img, 1, mode="edge")
        img = (img[:-2, 1:-1] + img[2:, 1:-1] + img[1:-1, :-2]
               + img[1:-1, 2:] + img[1:-1, 1:-1]) / 5
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    for q, bound in [(90, 12), (50, 28)]:
        dec = jpeg_decode(jpeg_encode(img, quality=q))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= bound, (q, err.max())


def test_rgb_roundtrip():
    rgb = np.zeros((17, 23, 3), dtype=np.uint8)
    rgb[..., 0] = 200
    rgb[:8, :, 1] = 90
    rgb[..., 2] = 30
    dec = jpeg_decode(jpeg_encode(rgb, quality=90))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() < 30


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (9, 8), (8, 9)])
def test_non_multiple_of_8_dims(shape):
    img = np.full(shape, 100, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == shape and (dec == 100).all()


def test_gradient_high_quality():
    grad = (np.add.outer(np.arange(64) * 2, np.arange(48) * 3) % 256) \
        .astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(grad, quality=95))
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.mean() < 1.0


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg at all")
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xe0\x00\x02")   # truncated


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        jpeg_encode(np.zeros((8, 8), dtype=np.int32))
    with pytest.raises(ValueError, match="channels"):
        jpeg_encode(np.zeros((8, 8, 4), dtype=np.uint8))


def test_progressive_rejected():
    """A SOF2 (progressive) header must raise, not mis-decode."""
    img = np.full((8, 8), 80, dtype=np.uint8)
    data = bytearray(jpeg_encode(img))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive|unsupported"):
        jpeg_decode(bytes(data))


def test_foreign_table_order_tolerated():
    """Decoder must not depend on our own segment ordering: move the
    DHT segments ahead of DQT (legal per T.81) and decode again."""
    img = np.full((16, 16), 66, dtype=np.uint8)
    data = bytes(jpeg_encode(img))

    def seg(data, marker):
        i = data.find(marker)
        assert i >= 0
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        return i, data[i:i + 2 + ln]

    di, dqt = seg(data, b"\xff\xdb")
    rest = data[:di] + data[di + len(dqt):]
    hi, _ = seg(rest, b"\xff\xc4")
    reordered = rest[:hi] + dqt + rest[hi:]
    dec = jpeg_decode(reordered)
    assert int(dec.min()) == int(dec.max()) == 66
