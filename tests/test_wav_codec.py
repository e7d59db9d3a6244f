"""wav_codec: differential vs stdlib ``wave`` in both directions, plus
the Spark-side WAV feature path (real container parse == raw-PCM law).
"""

import io
import wave

import numpy as np
import pytest

from adopt_spark.functions.wav_codec import WavFormatError, wav_decode, wav_encode


def test_encode_read_by_stdlib_wave_16bit_stereo():
    rng = np.random.default_rng(0)
    s = rng.integers(-30000, 30000, size=(500, 2)).astype(np.int16)
    payload = wav_encode(s, 44100, bits=16)
    w = wave.open(io.BytesIO(payload))
    assert (w.getnchannels(), w.getsampwidth(),
            w.getframerate(), w.getnframes()) == (2, 2, 44100, 500)
    raw = np.frombuffer(w.readframes(500), dtype="<i2").reshape(500, 2)
    assert (raw == s).all()


def test_decode_stdlib_wave_output_8bit_mono():
    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1); ww.setsampwidth(1); ww.setframerate(8000)
    u8 = rng.integers(0, 256, 300, dtype=np.uint8)
    ww.writeframes(u8.tobytes()); ww.close()
    mono, sr = wav_decode(buf.getvalue())
    assert sr == 8000
    assert (mono == u8.astype(np.int16) - 128).all()


def test_roundtrip_8bit_odd_length_pads():
    s8 = np.arange(-128, 173, dtype=np.int16) % 256 - 128  # 301 samples (odd)
    mono, sr = wav_decode(wav_encode(s8, 16000, bits=8))
    assert sr == 16000
    assert (mono == s8).all()


def test_stereo_mixdown_truncates_toward_zero():
    st = np.array([[1, 2], [-1, -2], [3, -2], [-3, 2]], dtype=np.int16)
    mono, _ = wav_decode(wav_encode(st, 8000, bits=16))
    assert mono.tolist() == [1, -1, 0, 0]


def test_unknown_chunks_and_any_order_are_tolerated():
    s8 = np.arange(64, dtype=np.int16) - 32
    p = wav_encode(s8, 16000, bits=8)
    body = p[12:]
    junk = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"  # odd+pad
    spliced = (b"RIFF" + (4 + len(junk) + len(body)).to_bytes(4, "little")
               + b"WAVE" + junk + body)
    mono, sr = wav_decode(spliced)
    assert sr == 16000 and (mono == s8).all()


@pytest.mark.parametrize("bad", [
    b"", b"RIFFxxxxAIFF", b"RIFF\x00\x00\x00\x00WAVE",  # no chunks at all
])
def test_malformed_payloads_raise(bad):
    with pytest.raises(WavFormatError):
        wav_decode(bad)


def test_truncated_data_chunk_raises():
    p = wav_encode(np.zeros(100, dtype=np.int16), 8000, bits=16)
    with pytest.raises(WavFormatError):
        wav_decode(p[:60])


def test_encode_rejects_out_of_range_and_bad_depth():
    with pytest.raises(WavFormatError):
        wav_encode(np.array([300], dtype=np.int16), 8000, bits=8)
    with pytest.raises(WavFormatError):
        wav_encode(np.zeros(4), 8000, bits=24)
    with pytest.raises(WavFormatError):
        wav_encode(np.zeros(4, dtype=np.int16), 0, bits=16)


def test_wav_features_match_raw_pcm_features(spark):
    """The real container path must reproduce the raw-PCM fixture's
    features exactly (same sample law underneath); only the payload —
    and therefore the sha — differs."""
    from adopt_spark.functions.multimodal import (
        audio_features, synthetic_pcm_media, synthetic_wav_media,
    )

    keys = spark.range(0, 40).selectExpr("id * 37 as media_id")
    pcm = {r["media_id"]: (r["duration_s"], round(r["rms"], 6),
                           r["zero_crossings"], r["peak"])
           for r in audio_features(synthetic_pcm_media(keys)).collect()}
    wav_rows = audio_features(synthetic_wav_media(keys)).collect()
    wav = {r["media_id"]: (r["duration_s"], round(r["rms"], 6),
                           r["zero_crossings"], r["peak"])
           for r in wav_rows}
    assert wav == pcm and len(wav) == 40
    # payloads differ (container header), so shas must differ from raw
    pcm_sha = {r["media_id"]: r["sha"]
               for r in audio_features(synthetic_pcm_media(keys)).collect()}
    assert all(r["sha"] != pcm_sha[r["media_id"]] for r in wav_rows)
