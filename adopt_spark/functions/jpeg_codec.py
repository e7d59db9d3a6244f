"""Minimal pure-stdlib baseline JPEG codec (ITU-T T.81 / JFIF).

Retires the round-3 "JPEG needs an injected decoder" gap without any
third-party library — the dominant real-world image format in a
100-TB multimodal corpus is JPEG, so the engine's image kernels need
a native path for it.

``jpeg_encode``: baseline sequential DCT (SOF0), 8-bit, grayscale
(1 component) or RGB via YCbCr 4:4:4 (3 components) — level shift,
exact 2-D DCT-II (orthonormal matrix form, which equals the T.81
FDCT scaling), Annex-K quantization tables scaled by the usual
quality parameter, zigzag, differential-DC + run-length-AC Huffman
coding with the Annex-K standard code tables, 0xFF byte stuffing,
and SOI/APP0/DQT/SOF0/DHT/SOS/EOI framing.

``jpeg_decode``: parses DQT/DHT/SOF0/SOS/DRI segments (so it reads
foreign baseline JPEGs, not just its own output), entropy-decodes
interleaved MCUs with per-component sampling factors (4:4:4, 4:2:2,
4:2:0 — chroma is nearest-neighbor upsampled per JFIF), honors
restart intervals (RSTn reset the bit reader and DC predictors),
dequantizes, inverse-DCTs, level-shifts, clips, and converts YCbCr
back to RGB. Progressive (SOF2), arithmetic coding, 12-bit depth,
and >2 sampling factors raise loudly rather than mis-decoding.

DCT note: with quality=50 the Annex-K luminance table has q[0,0]=16,
and a CONSTANT 8x8 block has DC = 8*(v-128) and exactly-zero ACs, so
a constant gray v decodes to floor((v-128)/2 + 0.5)*2 + 128 — EVEN
gray values round-trip bit-exactly, odd values land on v+1 — a
closed form. multimodal.synthetic_jpeg_media exploits this to give
JPEG payloads a value-level DuckDB oracle while still exercising the
full Huffman/DCT/quantization path.

These run inside Arrow-batched ``mapInPandas`` kernels
(multimodal.decode_images); DCT/quantization are vectorized across
all blocks of an image, the entropy coder is per-block Python (fine
for the thumbnail-scale fixtures; a production deployment would swap
in libjpeg-turbo via the same injectable-decoder seam).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 / K.2 quantization tables (luminance, chrominance)
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# zigzag scan order: ZIGZAG[k] = flat index into the 8x8 block
_zz = np.array(sorted(
    ((u, v) for u in range(8) for v in range(8)),
    key=lambda t: (t[0] + t[1],          # diagonal, then direction:
                   t[0] if (t[0] + t[1]) % 2 else t[1])))
ZIGZAG = (_zz[:, 0] * 8 + _zz[:, 1]).astype(np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II matrix: T @ block @ T.T == the T.81 FDCT
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _T[_i, _j] = (np.sqrt(1 / 8) if _i == 0 else
                      np.sqrt(2 / 8) * np.cos((2 * _j + 1) * _i * np.pi / 16))


def _canonical_codes(bits: list[int], values: list[int]):
    """T.81 C.2 canonical Huffman assignment: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]):
    """{(length, code): symbol} for the reader."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, values).items()}


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """The usual libjpeg quality scaling of an Annex-K table (50 = as
    published); clamps to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad HxW to 8-multiples (edge replicate) and return
    (n_blocks, 8, 8) float blocks + block grid dims."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64), ((0, H - h), (0, W - w)),
                    mode="edge")
    blocks = (padded.reshape(H // 8, 8, W // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    return blocks, H // 8, W // 8


def _mag_bits(v: int) -> tuple[int, int]:
    """(category size, appended bits) for a DC diff / AC coefficient,
    per T.81 F.1.2.1 (negative values use the one's-complement form)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-pad per spec


def _encode_plane(blocks_q: np.ndarray, dc_codes, ac_codes,
                  writer: _BitWriter, dc_pred: int) -> int:
    """Huffman-encode quantized zigzagged blocks (n, 64); returns the
    final DC predictor."""
    for blk in blocks_q:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size, bits = _mag_bits(diff)
        code, ln = dc_codes[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]     # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _mag_bits(v)
            code, ln = ac_codes[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]         # EOB
            writer.write(code, ln)
    return dc_pred


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in table.reshape(-1)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _dht_segment(cls: int, tid: int, bits, values) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(img: np.ndarray, quality: int = 50) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 as baseline JFIF."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode expects HxW or HxWx3 uint8")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("3-d input must have exactly 3 channels (RGB)")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    qlum = quality_scale(QUANT_LUM, quality)
    qchrom = quality_scale(QUANT_CHROM, quality)

    if gray:
        planes = [(img, qlum)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        planes = [(y, qlum), (cb, qchrom), (cr, qchrom)]

    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHROM)
    ac_c = _canonical_codes(*_AC_CHROM)

    # per-plane quantized zigzag blocks (vectorized DCT over all blocks)
    plane_blocks = []
    for plane, qt in planes:
        blocks, bh, bw = _blockify(np.asarray(plane, dtype=np.float64))
        coefs = np.einsum("ij,njk,lk->nil", _T, blocks - 128.0, _T)
        # deterministic quantization: 6-dp pre-round kills matmul float
        # noise (DCT coefficients are >> 1e-6), then floor(x + 0.5) is
        # an exact, engine-reproducible half-up rule — this is what
        # makes the constant-block decode law closed-form for oracles
        q = np.floor(np.round(coefs, 6) / qt[None, :, :] + 0.5) \
            .astype(np.int32)
        plane_blocks.append(q.reshape(-1, 64)[:, ZIGZAG])

    writer = _BitWriter()
    if gray:
        _encode_plane(plane_blocks[0], dc_l, ac_l, writer, 0)
    else:
        # interleaved 4:4:4 MCUs: one block per component per MCU
        preds = [0, 0, 0]
        tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
        n_mcu = plane_blocks[0].shape[0]
        for m in range(n_mcu):
            for c in range(3):
                preds[c] = _encode_plane(plane_blocks[c][m:m + 1],
                                         *tabs[c], writer, preds[c])
    writer.flush()

    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    ncomp = 1 if gray else 3
    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
        for cid in range(ncomp))
    sof = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp)
           + bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
           + sof_comps)
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11])
        for cid in range(ncomp))
    sos = (b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp)
           + bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))

    parts = [b"\xff\xd8", app0, _dqt_segment(0, qlum)]
    if not gray:
        parts.append(_dqt_segment(1, qchrom))
    parts += [sof,
              _dht_segment(0, 0, *_DC_LUM), _dht_segment(1, 0, *_AC_LUM)]
    if not gray:
        parts += [_dht_segment(0, 1, *_DC_CHROM),
                  _dht_segment(1, 1, *_AC_CHROM)]
    parts += [sos, bytes(writer.out), b"\xff\xd9"]
    return b"".join(parts)


# ---------------------------------------------------------------- decode

class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} "
                                 "inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def skip_restart(self) -> None:
        """Consume the RSTn marker at the current byte position."""
        self.byte_align()
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG stream")
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG into HxW (grayscale) or HxWx3 (RGB)
    uint8. Supports 4:4:4 / 4:2:2 / 4:2:0 sampling and restart
    intervals; raises ValueError on progressive, arithmetic, 12-bit,
    or otherwise unsupported streams.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:            # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        payload = data[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:            # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                vals = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qtables[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:          # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                values = list(payload[p + 17:p + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            depth = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            comps = []
            for c in range(ncomp):
                cid, samp, qid = payload[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG type (SOF marker 0xFF{marker:02X}: "
                "progressive/arithmetic/hierarchical)")
        elif marker == 0xDD:          # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:          # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            if ns < len(frame["comps"]):
                # a multi-scan (non-interleaved) baseline JPEG puts each
                # component in its own SOS; decoding just the first scan
                # would silently yield a luma-only image — raise instead
                raise ValueError(
                    "multi-scan (non-interleaved) baseline JPEG "
                    f"unsupported: SOS covers {ns} of "
                    f"{len(frame['comps'])} components")
            scan = []
            for c in range(ns):
                cid, tabs = payload[1 + 2 * c], payload[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append({**comp, "dc": tabs >> 4, "ac": tabs & 0x0F})
            return _decode_scan(data, pos, frame, scan, qtables, htables,
                                restart_interval)
        # other markers (APPn, COM) are skipped
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    planes = []
    for c in scan:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.skip_restart()
            preds = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(scan):
            dc_tab = htables[(0, c["dc"])]
            ac_tab = htables[(1, c["ac"])]
            qt = qtables[c["q"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    size = _huff_decode(reader, dc_tab)
                    diff = _extend(reader.read_bits(size), size)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(reader, ac_tab)
                        if sym == 0x00:        # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if sym == 0xF0:        # ZRL
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    coefs = np.zeros(64, dtype=np.float64)
                    coefs[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                    block = _T.T @ coefs.reshape(8, 8) @ _T + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    # upsample to full MCU-grid resolution, then trim to (h, w)
    out_planes = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])

    if len(scan) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
