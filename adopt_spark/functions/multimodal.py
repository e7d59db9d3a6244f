"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with a metadata
struct. The Spark-side machinery — schema, partition sizing, Arrow
batch shape through mapInPandas, and the metadata bookkeeping — is
real and tested. The image codec is REAL for 8-bit grayscale PNG
(png_codec.py, pure stdlib zlib): ``decode_images``' default decoder
detects the PNG signature and runs the full chunk-parse + inflate +
unfilter pipeline; non-PNG payloads route to a clearly-documented
deterministic fake (raw-byte reshape) so legacy fixtures keep
working. The audio codec is likewise REAL for RIFF/WAVE PCM
(wav_codec.py, pure stdlib struct — 8/16-bit, any channel count,
chunk-order tolerant): ``audio_features``' default decoder detects
the RIFF signature and takes duration from the container's own
sample rate. Compressed formats (JPEG, MP3/AAC, video containers)
still need an injected decoder — ``require_real_codecs()`` gates
those loudly.

Batch-shape contract (what matters at 100 TB): payloads are large, so
``spark.sql.files.maxPartitionBytes`` (not row count) governs scan
partitioning, and the kernels iterate Arrow batches without
concatenating them — peak memory per task stays one batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from adopt_spark.functions.jpeg_codec import jpeg_decode, jpeg_encode
from adopt_spark.functions.png_codec import png_decode, png_encode
from adopt_spark.functions.wav_codec import wav_decode, wav_encode

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def require_real_codecs() -> None:
    """Production gate for formats without a native decoder.

    8-bit PNG (gray/RGB, png_codec.py), baseline JPEG (gray/YCbCr
    with 4:4:4 / 4:2:2 / 4:2:0 sampling, jpeg_codec.py) and RIFF/WAVE
    PCM (wav_codec.py) decode natively. Everything else (progressive
    JPEG, compressed audio, video containers) needs PIL/ffmpeg,
    absent in this environment — inject a decoder via
    ``decode_images(..., decoder=...)`` / ``audio_features(...,
    decoder=...)`` or install the libraries.
    """
    raise NotImplementedError(
        "PNG, baseline JPEG and PCM WAV have native codecs here; for other "
        "formats inject a decoder via decode_images(..., decoder=...) / "
        "audio_features(..., decoder=...) or install PIL/ffmpeg"
    )


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42,
                    kind: str = "image") -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA.

    kind="image" keeps its round-1 byte-identical generation; "audio"
    draws a sample rate + sample count, "video" a frame count — the
    kind-specific draws happen after the payload, so image tables are
    unchanged by the extension.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        if kind == "audio":
            sr = int(rng.choice([8000, 16000, 44100]))
            n_samples = int(rng.integers(256, 4096))
            payload = rng.integers(0, 256, size=n_samples,
                                   dtype=np.uint8).tobytes()
            rows.append((i, kind, bytearray(payload), (0, 0, sr, 0)))
        elif kind == "video":
            payload = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            n_frames = int(rng.integers(10, 120))
            rows.append((i, kind, bytearray(payload), (w, h, 0, n_frames)))
        else:
            payload = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            rows.append((i, kind, bytearray(payload), (w, h, 0, 1)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image codec: bytes → HxW u8."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    return arr[:need].reshape(height, width)


def default_image_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Default decoder: REAL PNG decode when the payload carries the
    PNG signature, REAL baseline-JPEG decode on an SOI marker
    (jpeg_codec.py — dimensions come from the container in both
    cases, the metadata args are ignored); raw-byte reshape fake
    otherwise (legacy fixtures)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode(payload)
    return _fake_decode(payload, width, height)


def synthetic_png_media(keys: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Closed-form PNG media table: one real PNG per input key row.

    Pixel i of image ``k`` is ``(k*31 + i*7) % 256`` over a
    ``(k%17+8) x (k%23+8)`` frame, encoded with scanline filter
    ``k % 5`` — every PNG filter type appears in the fixture, so the
    decoder's whole unfilter surface runs in the pipeline. The pixel
    law is also expressible in ANSI SQL, which is what gives
    decode_images a value-level DuckDB oracle (the decoded stats must
    reproduce the closed form).
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            payloads, ws, hs = [], [], []
            for k in ids:
                w, h = int(k % 23 + 8), int(k % 17 + 8)
                i = np.arange(w * h, dtype=np.int64)
                px = ((int(k) * 31 + i * 7) % 256).astype(np.uint8)
                payloads.append(png_encode(px.reshape(h, w),
                                           filter_type=int(k % 5)))
                ws.append(w); hs.append(h)
            yield pd.DataFrame({
                "media_id": ids, "kind": ["image"] * len(ids),
                "payload": payloads,
                "meta": [{"width": w, "height": h, "sample_rate": 0,
                          "n_frames": 1} for w, h in zip(ws, hs)],
            })

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthetic_jpeg_media(keys: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Closed-form baseline-JPEG media table: one REAL JPEG per key.

    Image ``k`` is ``((k%2)+1)*8`` rows x ``((k%3)+1)*8`` cols of
    8x8-aligned CONSTANT blocks; block ``j`` (row-major) has gray
    value ``(k*37 + j*59) % 256``. A constant block has DC =
    8*(v-128) and exactly-zero ACs, so at quality 50 (q00 = 16) the
    decoded block is the closed form

        clip(floor((v-128)/2 + 0.5)*2 + 128, 0, 255)

    — expressible in ANSI SQL, which gives the full Huffman / DCT /
    quantization / marker-parse path a value-level DuckDB oracle
    (oracle_gen-style), the same trick as synthetic_png_media.
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            rows = []
            for k in ids:
                bw, bh = int(k % 3 + 1), int(k % 2 + 1)
                w, h = bw * 8, bh * 8
                img = np.empty((h, w), dtype=np.uint8)
                for j in range(bw * bh):
                    by, bx = divmod(j, bw)
                    v = (int(k) * 37 + j * 59) % 256
                    img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
                rows.append((int(k), "image", jpeg_encode(img, quality=50),
                             {"width": w, "height": h, "sample_rate": 0,
                              "n_frames": 1}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "payload", "meta"])

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthetic_pcm_media(keys: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Closed-form raw-PCM audio table: sample i of clip ``k`` is the
    unsigned byte ``(k*13 + i*11) % 256`` over ``k%512+256`` samples at
    a sample rate of 8000/16000/44100 by ``k % 3`` — the same SQL-
    expressible-law trick as synthetic_png_media, giving audio_features
    a value-level oracle."""
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            rows = []
            for k in ids:
                n = int(k % 512 + 256)
                sr = [8000, 16000, 44100][int(k % 3)]
                i = np.arange(n, dtype=np.int64)
                s = ((int(k) * 13 + i * 11) % 256).astype(np.uint8)
                rows.append((int(k), "audio", s.tobytes(),
                             {"width": 0, "height": 0, "sample_rate": sr,
                              "n_frames": 0}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "payload", "meta"])

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, sha string, mean_px double, std_px double, "
    "hist array<long>, thumb_w int, thumb_h int"
)


def decode_images(media: DataFrame,
                  decoder: Callable[[bytes, int, int], np.ndarray] | None = None,
                  thumb: int = 8) -> DataFrame:
    """Decode → feature-extract → resize, one Arrow batch at a time.

    Output per row: payload sha256 (the per-row invariant), mean/std
    pixel, 16-bin histogram, thumbnail dims after an integer resize.
    ``decoder=None`` uses default_image_decode: REAL PNG decode for
    PNG payloads, raw-byte fake otherwise (see module note).
    """
    decode = decoder or default_image_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sha = [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]]
            mean = np.empty(n); std = np.empty(n)
            hists = []; tw = np.empty(n, dtype=np.int32); th = np.empty(n, dtype=np.int32)
            for i, (p, m) in enumerate(zip(pdf["payload"], pdf["meta"])):
                img = decode(bytes(p), int(m["width"]), int(m["height"]))
                mean[i] = float(img.mean()); std[i] = float(img.std())
                hists.append(np.histogram(img, bins=16, range=(0, 256))[0].astype(np.int64))
                sy = max(1, img.shape[0] // thumb); sx = max(1, img.shape[1] // thumb)
                small = img[::sy, ::sx]
                th[i], tw[i] = small.shape
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(), "sha": sha,
                "mean_px": mean, "std_px": std, "hist": hists,
                "thumb_w": tw, "thumb_h": th,
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = ("media_id long, sha string, duration_s double, "
                        "rms double, zero_crossings long, peak int")


def _fake_pcm_decode(payload: bytes, sample_rate: int) -> np.ndarray:
    """Deterministic stand-in for a real audio codec: bytes → centered
    int16-ish waveform (u8 samples re-centered at 0)."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128


def default_audio_decode(payload: bytes, sample_rate: int):
    """Default audio decoder: REAL RIFF/WAVE PCM decode when the
    payload carries the RIFF signature — returns ``(waveform, sr)``
    with the sample rate read from the container itself, overriding
    the metadata column — raw-u8 fake otherwise (legacy fixtures),
    returning just the waveform so the metadata rate applies."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_decode(payload)
    return _fake_pcm_decode(payload, sample_rate)


def synthetic_wav_media(keys: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Closed-form REAL-WAV audio table: the synthetic_pcm_media sample
    law — sample i of clip ``k`` is ``(k*13 + i*11) % 256 - 128`` over
    ``k%512+256`` samples at 8000/16000/44100 by ``k % 3`` — encoded
    through wav_codec as an 8-bit mono RIFF/WAVE file. Decoded
    waveforms are byte-identical to the raw-PCM fixture's, so the same
    SQL law (oracle_gen.AUDIO_FEATURES_SQL) is a value-level oracle for
    the full container-parse + decode + feature path."""
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            rows = []
            for k in ids:
                n = int(k % 512 + 256)
                sr = [8000, 16000, 44100][int(k % 3)]
                i = np.arange(n, dtype=np.int64)
                s = ((int(k) * 13 + i * 11) % 256 - 128).astype(np.int16)
                rows.append((int(k), "audio", wav_encode(s, sr, bits=8),
                             {"width": 0, "height": 0, "sample_rate": sr,
                              "n_frames": 0}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "payload", "meta"])

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def audio_features(media: DataFrame,
                   decoder: Callable[[bytes, int], np.ndarray] | None = None
                   ) -> DataFrame:
    """Decode → per-clip audio features, one Arrow batch at a time.

    Output per row: payload sha256 (the per-row invariant), duration
    (samples / sample_rate), RMS amplitude, zero-crossing count, peak.
    ``decoder=None`` uses default_audio_decode: REAL RIFF/WAVE PCM
    decode for WAV payloads, raw-u8 fake otherwise. A decoder may
    return either a bare waveform (metadata sample rate applies) or a
    ``(waveform, sample_rate)`` pair to assert the container's own
    rate (what the WAV path does)."""
    decode = decoder or default_audio_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sha = [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]]
            dur = np.empty(n); rms = np.empty(n)
            zc = np.empty(n, dtype=np.int64); peak = np.empty(n, dtype=np.int32)
            for i, (p, m) in enumerate(zip(pdf["payload"], pdf["meta"])):
                sr = max(int(m["sample_rate"]), 1)
                wave = decode(bytes(p), sr)
                if isinstance(wave, tuple):
                    wave, sr = wave
                    sr = max(int(sr), 1)
                if wave.size == 0:
                    dur[i] = 0.0; rms[i] = 0.0; zc[i] = 0; peak[i] = 0
                    continue
                dur[i] = wave.size / sr
                rms[i] = float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))
                zc[i] = int(np.count_nonzero(np.diff(np.signbit(wave))))
                peak[i] = int(np.abs(wave).max())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(), "sha": sha,
                "duration_s": dur, "rms": rms,
                "zero_crossings": zc, "peak": peak,
            })

    return media.where(F.col("kind") == "audio").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA)


def audio_frame_energy(media: DataFrame, frame: int = 16,
                       decoder: Callable[[bytes, int], np.ndarray] | None = None
                       ) -> DataFrame:
    """Decode → per-frame INTEGER energy rows:
    ``[media_id, frame_idx, n_samples, sum_sq]``.

    The Arrow kernel only decodes and blocks the waveform; everything
    downstream (silence classification, run analysis) stays relational
    so it composes with joins/windows. Integer sum-of-squares instead
    of float RMS makes the frame rows EXACT — the DuckDB oracle
    replays them digit-for-digit with no rounding discipline needed.
    The last frame may be partial; its own ``n_samples`` rides along
    so thresholds compare per-sample energy, not per-frame.
    """
    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")
    decode = decoder or default_audio_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_fi, out_ns, out_ss = [], [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                sr = max(int(m["sample_rate"]), 1)
                wave = decode(bytes(p), sr)
                if isinstance(wave, tuple):
                    wave = wave[0]
                if wave.size == 0:
                    continue
                sq = wave.astype(np.int64) ** 2
                n_fr = (wave.size + frame - 1) // frame
                idx = np.arange(wave.size) // frame
                ss = np.bincount(idx, weights=sq).astype(np.int64)
                ns = np.bincount(idx).astype(np.int64)
                out_id.extend([int(mid)] * n_fr)
                out_fi.extend(range(n_fr))
                out_ns.extend(ns.tolist())
                out_ss.extend(ss.tolist())
            yield pd.DataFrame({"media_id": np.array(out_id, np.int64),
                                "frame_idx": np.array(out_fi, np.int64),
                                "n_samples": np.array(out_ns, np.int64),
                                "sum_sq": np.array(out_ss, np.int64)})

    return media.where(F.col("kind") == "audio").mapInPandas(
        kernel, schema="media_id long, frame_idx long, n_samples long, "
                       "sum_sq long")


def silence_report(frames: DataFrame, threshold: int = 64) -> DataFrame:
    """Per-clip silence segmentation over frame-energy rows:
    ``[media_id, n_frames, n_silent, n_runs, longest_run,
    lead_silence, trail_silence]``.

    A frame is silent iff ``sum_sq <= n_samples * threshold²`` (mean
    square ≤ threshold² — all-integer, exact). Runs come from the
    gaps-and-islands window trick (island id = frame_idx − rank among
    the clip's silent frames); the report is two hash aggs + one
    left join, no Python. Clips with no silent frames report zeros.
    """
    from pyspark.sql import Window

    t2 = int(threshold) * int(threshold)
    silent = F.col("sum_sq") <= F.col("n_samples") * F.lit(t2)
    tot = (frames.groupBy("media_id")
           .agg(F.count(F.lit(1)).alias("n_frames"),
                F.sum(silent.cast("long")).alias("n_silent")))
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    runs = (frames.where(silent)
            .withColumn("isl", F.col("frame_idx") - F.row_number().over(w))
            .groupBy("media_id", "isl")
            .agg(F.count(F.lit(1)).alias("len"),
                 F.min("frame_idx").alias("f0"),
                 F.max("frame_idx").alias("f1")))
    per = (runs.groupBy("media_id")
           .agg(F.count(F.lit(1)).alias("n_runs"),
                F.max("len").alias("longest_run"),
                F.max(F.when(F.col("f0") == 0, F.col("len"))
                      .otherwise(F.lit(0))).alias("lead_silence"),
                F.max(F.struct(F.col("f1"), F.col("len"))).alias("_last")))
    return (tot.join(per, "media_id", "left")
            .select("media_id", "n_frames", "n_silent",
                    F.coalesce("n_runs", F.lit(0)).alias("n_runs"),
                    F.coalesce("longest_run", F.lit(0)).alias("longest_run"),
                    F.coalesce("lead_silence", F.lit(0)).alias("lead_silence"),
                    F.coalesce(
                        F.when(F.col("_last.f1") == F.col("n_frames") - 1,
                               F.col("_last.len")).otherwise(F.lit(0)),
                        F.lit(0)).alias("trail_silence")))


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx) rows for
    every ``every``-th frame per the metadata — the explode-side
    plumbing of a real frame extractor."""
    return (
        media.where(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                                     F.lit(every))).alias("frame_idx"))
    )


def synthetic_png_neardup_media(keys: DataFrame,
                                id_col: str = "media_id") -> DataFrame:
    """Near-duplicate PNG fixture: 7 base images + per-key perturbation.

    Every image is 16x16 grayscale; pixel i of image ``k`` is
    ``((k % 7) * 31 + i * 7) % 256`` — the BASE depends only on
    ``k % 7``, so keys in the same residue class are near-identical —
    plus a per-key perturbation ``+16 (mod 256)`` at positions with
    ``i % 61 == k % 61`` (~4 of 256 pixels). Scanline filter ``k % 5``
    keeps the whole unfilter surface in play. The law is closed-form,
    so the perceptual-hash dedup built on the DECODED pixels has a
    value-level SQL oracle.
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            payloads = []
            i = np.arange(256, dtype=np.int64)
            for k in ids:
                px = ((int(k) % 7) * 31 + i * 7) % 256
                px = np.where(i % 61 == int(k) % 61, (px + 16) % 256, px)
                payloads.append(png_encode(
                    px.astype(np.uint8).reshape(16, 16),
                    filter_type=int(k % 5)))
            yield pd.DataFrame({
                "media_id": ids, "kind": ["image"] * len(ids),
                "payload": payloads,
                "meta": [{"width": 16, "height": 16, "sample_rate": 0,
                          "n_frames": 1}] * len(ids),
            })

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def image_ahash(media: DataFrame,
                decoder: Callable[[bytes, int, int], np.ndarray] | None = None,
                ) -> DataFrame:
    """Perceptual average-hash over DECODED pixels -> (media_id, ahash).

    aHash: bin the image into an 8x8 block grid (integer binning, any
    w x h), set bit j when block j's mean exceeds the global mean.
    The threshold is evaluated as the integer cross-multiplication
    ``s_j * N > S * n_j`` (block sum x total count vs total sum x
    block count) — exact, so Spark and the closed-form SQL oracle
    compute the identical 63-bit hash (bit 63 is dropped to keep the
    BIGINT non-negative: band extraction then needs no unsigned-shift
    semantics on either engine). Exactness bound: s_j * N fits int64
    for images up to ~2^27 pixels.
    """
    decode = decoder or default_image_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.empty(len(pdf), dtype=np.int64)
            for x, (p, m) in enumerate(zip(pdf["payload"], pdf["meta"])):
                img = decode(bytes(p), int(m["width"]), int(m["height"]))
                h, w = img.shape
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                bins = ((r * 8 // h) * 8 + (c * 8 // w)).ravel()
                flat = img.ravel().astype(np.int64)
                s = np.bincount(bins, weights=flat, minlength=64).astype(np.int64)
                n = np.bincount(bins, minlength=64).astype(np.int64)
                bits = (s * flat.size) > (int(flat.sum()) * n)
                out[x] = int(np.sum(
                    (1 << np.arange(63, dtype=np.uint64))[bits[:63]]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(), "ahash": out})

    return media.mapInPandas(kernel, schema="media_id long, ahash long")


# 4 bands over the 63-bit hash: [0..15], [16..31], [32..47], [48..62].
_AHASH_BANDS = ((0, 0xFFFF), (16, 0xFFFF), (32, 0xFFFF), (48, 0x7FFF))


def image_near_dup(media: DataFrame, max_hamming: int = 3,
                   decoder: Callable[[bytes, int, int], np.ndarray] | None = None,
                   ) -> DataFrame:
    """Perceptual near-duplicate image pairs -> (a, b, hamming).

    Candidates come from banded-LSH equi-joins on the aHash (4 x
    16-bit bands — by pigeonhole, any pair within Hamming distance
    < 4 shares at least one exact band, so ``max_hamming <= 3`` is
    COMPLETE, not approximate); survivors are verified with the exact
    ``bit_count(xor)`` distance. Same shape as the simhash text dedup
    (functions/dedup.py): bounded-key equi-join candidates, never
    all-pairs — the 100-TB plan.
    """
    if max_hamming >= len(_AHASH_BANDS):
        raise ValueError("max_hamming must be < number of bands (4) "
                         "for the band join to be complete")
    hashes = image_ahash(media, decoder=decoder)
    bands = []
    for bi, (shift, mask) in enumerate(_AHASH_BANDS):
        bands.append(hashes.select(
            "media_id", "ahash", F.lit(bi).alias("band"),
            F.shiftrightunsigned("ahash", shift).bitwiseAND(F.lit(mask))
             .alias("bval")))
    from functools import reduce
    banded = reduce(DataFrame.unionAll, bands)
    left = banded.select(F.col("media_id").alias("a"),
                         F.col("ahash").alias("ha"), "band", "bval")
    right = banded.select(F.col("media_id").alias("b"),
                          F.col("ahash").alias("hb"), "band", "bval")
    cand = (left.join(right, ["band", "bval"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "ha", "hb").distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("a", "b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def image_thumbnails(media: DataFrame, size: int = 4,
                     decoder: Callable[[bytes, int, int],
                                       np.ndarray] | None = None
                     ) -> DataFrame:
    """Nearest-neighbor thumbnails THROUGH the real decode path, with
    the re-encode roundtrip asserted in-kernel: decode the payload,
    sample thumbnail pixel (r, c) from source (r*h//size, c*w//size),
    re-encode the thumbnail as PNG and decode it back — any
    encode/decode asymmetry raises inside the batch instead of
    emitting silently wrong pixels. Output: one row per thumbnail
    pixel (media_id, r, c, px) — value-level checkable against the
    fixture's closed pixel law. One Arrow map stage, rows out =
    size² per image (never the full frame)."""
    decode = decoder or default_image_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from adopt_spark.functions.png_codec import png_decode, png_encode
        for pdf in it:
            ids, rs, cs, pxs = [], [], [], []
            for p, m, mid in zip(pdf["payload"], pdf["meta"],
                                 pdf["media_id"]):
                img = decode(bytes(p), int(m["width"]), int(m["height"]))
                h, w = img.shape
                sr = (np.arange(size, dtype=np.int64) * h) // size
                sc = (np.arange(size, dtype=np.int64) * w) // size
                thumb = img[np.ix_(sr, sc)]
                back = png_decode(png_encode(thumb.astype(np.uint8)))
                if not np.array_equal(back, thumb):
                    raise ValueError(
                        f"PNG roundtrip mismatch for media {mid}")
                ids.extend([int(mid)] * (size * size))
                rr, cc = np.meshgrid(np.arange(size), np.arange(size),
                                     indexing="ij")
                rs.extend(rr.ravel().tolist())
                cs.extend(cc.ravel().tolist())
                pxs.extend(thumb.ravel().astype(np.int64).tolist())
            yield pd.DataFrame({"media_id": ids, "r": rs, "c": cs,
                                "px": pxs})

    return media.mapInPandas(
        kernel, schema="media_id long, r int, c int, px long")


def synthetic_rgb_media(keys: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Closed-form RGB-PNG media table (truecolor twin of
    synthetic_png_media): channel c of pixel i of image ``k`` is
    ``(k*31 + i*7 + c*11) % 256`` over a ``(k%17+8) x (k%23+8) x 3``
    frame, encoded with scanline filter ``k % 5`` — every unfilter
    path runs against 3-byte pixels, whose "left" neighbor sits bpp=3
    bytes back (the part a bytewise-offset bug would break). The law
    is ANSI-SQL-expressible per channel, giving the RGB decode a
    value-level DuckDB oracle.
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            payloads, metas = [], []
            for k in ids:
                w, h = int(k % 23 + 8), int(k % 17 + 8)
                i = np.repeat(np.arange(w * h, dtype=np.int64), 3)
                c = np.tile(np.arange(3, dtype=np.int64), w * h)
                px = ((int(k) * 31 + i * 7 + c * 11) % 256).astype(np.uint8)
                payloads.append(png_encode(px.reshape(h, w, 3),
                                           filter_type=int(k % 5)))
                metas.append({"width": w, "height": h,
                              "sample_rate": 0, "n_frames": 1})
            yield pd.DataFrame({
                "media_id": ids, "kind": ["image"] * len(ids),
                "payload": payloads, "meta": metas,
            })

    return keys.select(F.col(id_col)).mapInPandas(kernel, schema=MEDIA_SCHEMA)


RGB_FEATURE_SCHEMA = ("media_id long, sha string, mean_r double, "
                      "mean_g double, mean_b double, std_px double")


def decode_rgb_features(media: DataFrame) -> DataFrame:
    """Per-channel means + global std through the REAL RGB PNG decode,
    one Arrow batch at a time. A wrong inflate, unfilter, or channel
    interleave cannot reproduce all three channel means at once."""
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sha = [hashlib.sha256(bytes(p)).hexdigest()
                   for p in pdf["payload"]]
            mr = np.empty(n); mg = np.empty(n); mb = np.empty(n)
            sp = np.empty(n)
            for i, p in enumerate(pdf["payload"]):
                img = png_decode(bytes(p))
                if img.ndim != 3:
                    raise ValueError("decode_rgb_features expects RGB")
                mr[i] = float(img[:, :, 0].mean())
                mg[i] = float(img[:, :, 1].mean())
                mb[i] = float(img[:, :, 2].mean())
                sp[i] = float(img.std())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(), "sha": sha,
                "mean_r": mr, "mean_g": mg, "mean_b": mb, "std_px": sp,
            })

    return media.mapInPandas(kernel, schema=RGB_FEATURE_SCHEMA)
