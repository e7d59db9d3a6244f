"""aHash perceptual near-dup: completeness vs brute force + decode path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.multimodal import (
    image_ahash, image_near_dup, synthetic_png_neardup_media,
)


@pytest.fixture(scope="module")
def media(spark):
    keys = spark.range(60).withColumnRenamed("id", "media_id")
    return synthetic_png_neardup_media(keys).cache()


def test_ahash_same_class_close_other_class_far(spark, media):
    h = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert all(v >= 0 for v in h.values())          # bit 63 dropped
    same = bin(h[0] ^ h[7]).count("1")               # same base class
    diff = bin(h[0] ^ h[1]).count("1")               # different class
    assert same <= 3 < diff


def test_near_dup_matches_bruteforce(spark, media):
    h = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    want = sorted(
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for a in h for b in h
        if a < b and bin(h[a] ^ h[b]).count("1") <= 3)
    got = sorted(map(tuple, image_near_dup(media, max_hamming=3).collect()))
    assert got == want and len(got) > 0


def test_near_dup_uses_decoded_pixels(spark, media):
    # corrupting the decoder must change the hashes — proves the hash
    # consumes DECODED pixels, not payload bytes
    def broken(payload: bytes, w: int, h: int) -> np.ndarray:
        return np.zeros((h, w), dtype=np.uint8)

    flat = image_ahash(media, decoder=broken).collect()
    assert all(r.ahash == 0 for r in flat)           # all-equal image -> no bits


def test_near_dup_rejects_incomplete_threshold(spark, media):
    with pytest.raises(ValueError):
        image_near_dup(media, max_hamming=4)


def test_near_dup_partition_invariance(spark, media):
    a = sorted(map(tuple,
                   image_near_dup(media.repartition(1)).collect()))
    b = sorted(map(tuple,
                   image_near_dup(media.repartition(7)).collect()))
    assert a == b
