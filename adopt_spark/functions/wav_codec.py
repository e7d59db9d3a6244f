"""Pure-stdlib RIFF/WAVE (PCM) codec: numpy samples ⇄ WAV bytes.

Companion to png_codec.py — together they make the multimodal layer's
image AND audio paths real codecs rather than injected fakes, with no
dependency beyond numpy + struct (no PIL/ffmpeg/soundfile).

Supported: canonical RIFF/WAVE containers with PCM (format tag 1)
samples, 8-bit unsigned or 16-bit signed little-endian, any channel
count. The parser walks the chunk list (chunks may appear in any
order; unknown chunks — LIST, fact, cue, bext… — are skipped, and the
word-alignment pad byte after odd-sized chunks is honored), so files
from normal tools parse, not just our own encoder's output.

Decode contract (what the feature kernels rely on): samples come back
**centered at 0** regardless of storage width — 8-bit unsigned u8 is
shifted by −128 into int16, 16-bit signed passes through — and
multi-channel audio is mixed down to mono by per-frame arithmetic mean
truncated toward zero (int16). Tests are differential against the
stdlib ``wave`` module in both directions (it reads our bytes, we read
its bytes).

Reference parity: the reference engine has no media codecs at all
(SURVEY.md §2.10 scopes multimodal as beyond-reference pipeline
operators); this module exists for the training-data-pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Raised for malformed or unsupported WAV payloads."""


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode a waveform as a canonical RIFF/WAVE PCM file.

    ``samples``: 1-D mono ``(n,)`` or 2-D ``(n, channels)``. Values are
    interpreted on the **centered** scale: for ``bits=8`` they must fit
    in [-128, 127] and are stored as unsigned bytes (+128, per the WAV
    spec); for ``bits=16`` they must fit in int16 and are stored
    little-endian signed.
    """
    if bits not in (8, 16):
        raise WavFormatError(f"unsupported bit depth {bits} (want 8 or 16)")
    if sample_rate <= 0:
        raise WavFormatError(f"sample_rate must be positive, got {sample_rate}")
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavFormatError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    n_frames, n_channels = arr.shape
    if n_channels < 1:
        raise WavFormatError("need at least one channel")

    if bits == 8:
        lo, hi = int(arr.min(initial=0)), int(arr.max(initial=0))
        if lo < -128 or hi > 127:
            raise WavFormatError(f"8-bit samples must fit [-128,127], got [{lo},{hi}]")
        data = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        lo, hi = int(arr.min(initial=0)), int(arr.max(initial=0))
        if lo < -32768 or hi > 32767:
            raise WavFormatError(f"16-bit samples must fit int16, got [{lo},{hi}]")
        data = arr.astype("<i2").tobytes()

    bytes_per_sample = bits // 8
    block_align = n_channels * bytes_per_sample
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, bits)
    chunks = b"".join([
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
        b"\x00" if len(data) % 2 else b"",
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload → ``(mono int16 waveform, sample_rate)``.

    Walks the chunk list in file order, accepting any chunk ordering and
    skipping unknown chunks; requires one ``fmt `` (PCM, 8/16-bit) and
    one ``data`` chunk. See the module docstring for the sample scale.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE payload")

    fmt_fields = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise WavFormatError(f"truncated chunk {cid!r}: want {size}, have {len(body)}")
        if cid == b"fmt ":
            if size < 16:
                raise WavFormatError(f"fmt chunk too short ({size} bytes)")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks carry a pad byte

    if fmt_fields is None:
        raise WavFormatError("missing fmt chunk")
    if data is None:
        raise WavFormatError("missing data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt_fields
    if audio_format != 1:
        raise WavFormatError(f"unsupported WAV format tag {audio_format} (want PCM=1)")
    if bits not in (8, 16):
        raise WavFormatError(f"unsupported bit depth {bits} (want 8 or 16)")
    if n_channels < 1:
        raise WavFormatError("fmt chunk declares zero channels")

    if bits == 8:
        flat = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    else:
        usable = len(data) - (len(data) % 2)
        flat = np.frombuffer(data[:usable], dtype="<i2").astype(np.int16)

    frames = flat.size // n_channels
    flat = flat[:frames * n_channels].reshape(frames, n_channels)
    if n_channels == 1:
        mono = flat[:, 0]
    else:
        # per-frame arithmetic mean, truncated toward zero (matches C
        # integer division semantics; int32 accumulator avoids overflow)
        acc = flat.astype(np.int32).sum(axis=1)
        mono = (np.sign(acc) * (np.abs(acc) // n_channels)).astype(np.int16)
    return mono, int(sample_rate)
