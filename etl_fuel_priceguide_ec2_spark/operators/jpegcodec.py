"""Dependency-free baseline JPEG codec (X5 real-codec path, round 16).

Pure Python + numpy, no PIL/libjpeg: a sequential-baseline (SOF0)
encoder and decoder — grayscale and YCbCr color, 4:4:4 / 4:2:2 / 4:2:0
chroma subsampling, standard Annex-K quantization + Huffman tables,
restart markers on decode. Progressive (SOF2), arithmetic coding,
12-bit and hierarchical modes raise loudly — feature gates, not silent
misdecodes.

Exactness envelope (what makes JPEG oracle-able at all): JPEG is lossy
in general, but an 8x8-CONSTANT block has only a DC coefficient
(exactly 8*(v-128), float-exact) and all-zero AC; with the DC quantum
q <= 7 the dequantized DC is within 3.5 of the true value, the IDCT
divides the error by 8 (< 0.5), and the final round reconstructs the
pixel EXACTLY. Grayscale avoids the (lossy) RGB<->YCbCr rounding, so a
grayscale image built from constant 8x8 tiles round-trips bit-exactly
through the full entropy-coding pipeline — the property the
``image_ahash_keeplist_jpeg`` oracle stands on (and the strongest
possible correctness pin for a lossy codec: one wrong Huffman bit,
stuffing byte, predictor reset, or IDCT term breaks it).

All functions are per-payload (called inside Arrow batch loops); none
touch Spark.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# --- Annex K quantization tables (luminance / chrominance), zigzag ---

_STD_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

_STD_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# --- Annex K Huffman tables: (bits[1..16], huffval) ------------------

_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits, huffval):
    """(bits, huffval) -> {symbol: (code, length)} per Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_table(bits, huffval):
    """(bits, huffval) -> {(length, code): symbol} for the decoder —
    the inverse of :func:`_huff_codes`, derived from it so the
    Annex-C canonical-code walk has ONE definition the encoder and
    decoder cannot diverge on (code-review r16)."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_codes(bits, huffval).items()
    }


# DCT-II basis (JPEG normalization): F = A @ f @ A.T, f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def quant_tables(quality: int = 90) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the libjpeg quality convention, clamped
    to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lq = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)
    cq = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    return lq.astype(np.int64), cq.astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_one_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Entropy-code ONE zigzagged quantized block; returns the new DC
    predictor. The single definition both the grayscale scan and the
    color interleaved scan fold — the per-block DC-diff/ZRL/EOB logic
    was previously duplicated between them, a silent-divergence hazard
    (code-review r16)."""
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _encode_blocks(
    w: _BitWriter, blocks: np.ndarray, q: np.ndarray, dc_codes, ac_codes
) -> None:
    """Entropy-code a (n, 8, 8) stack of spatial blocks with one shared
    DC predictor (single-component scan)."""
    pred = 0
    coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks - 128.0, _A)
    qc = np.round(coefs / q).astype(np.int64)
    for n in range(qc.shape[0]):
        pred = _encode_one_block(w, qc[n].flatten()[_ZZ], pred, dc_codes, ac_codes)


def _tile_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate a plane up to 8-multiples and tile into a
    (n, 8, 8) stack in raster block order."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    bl = (
        padded.reshape(H // 8, 8, W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )
    return bl, H // 8, W // 8


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack(
        [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)], axis=-1
    ).astype(np.uint8)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack(
        [np.clip(np.round(p), 0, 255) for p in (r, g, b)], axis=-1
    ).astype(np.uint8)


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    return (
        b"\xff\xdb"
        + struct.pack(">H", 67)
        + bytes([tid])
        + bytes(int(v) for v in q.flatten()[_ZZ])
    )


def _dht_segment(tclass: int, tid: int, table) -> bytes:
    bits, huffval = table
    payload = bytes([(tclass << 4) | tid]) + bytes(bits[1:]) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(
    img: np.ndarray, quality: int = 90, grayscale: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB -> sequential-baseline JFIF JPEG (4:4:4 —
    no chroma subsampling, so color fidelity is bounded by quantization
    alone). ``grayscale=True`` encodes the single luma plane computed
    as ``(r+g+b)//3`` EXACT integer mean — the aHash's own gray, so a
    gray JPEG built from constant 8x8 tiles round-trips the hash input
    bit-exactly (see module docstring)."""
    h, w, c = img.shape
    assert c == 3, "encode_jpeg expects (h, w, 3) RGB"
    if h > 65535 or w > 65535 or h < 1 or w < 1:
        # SOF dimensions are u16 — struct would wrap silently and the
        # stream would misdecode with no error
        raise ValueError(f"JPEG dimensions out of range: {w}x{h}")
    lq, cq = quant_tables(quality)
    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0])
        + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, lq)
    if grayscale:
        gray = (
            img[:, :, 0].astype(np.int64)
            + img[:, :, 1].astype(np.int64)
            + img[:, :, 2].astype(np.int64)
        ) // 3
        out += (
            b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        )
        out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        bw = _BitWriter()
        blocks, _, _ = _tile_blocks(gray)
        _encode_blocks(bw, blocks, lq, dc_l, ac_l)
        bw.flush()
        out += bw.buf
        out += b"\xff\xd9"
        return bytes(out)

    out += _dqt_segment(1, cq)
    out += (
        b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    out += (
        b"\xff\xda" + struct.pack(">H", 12)
        + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    ycc = _rgb_to_ycbcr(img)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    tiled = [_tile_blocks(p) for p in planes]
    bh, bw_ = tiled[0][1], tiled[0][2]
    # 4:4:4 interleaved scan: one block per component per MCU, raster
    # order; per-component DC predictors
    bwiter = _BitWriter()
    preds = [0, 0, 0]
    qs = [lq, cq, cq]
    dcs = [dc_l, dc_c, dc_c]
    acs = [ac_l, ac_c, ac_c]
    coefs = [
        np.round(
            np.einsum("ux,nxy,vy->nuv", _A, t[0] - 128.0, _A) / qs[i]
        ).astype(np.int64)
        for i, t in enumerate(tiled)
    ]
    for n in range(bh * bw_):
        for ci in range(3):
            preds[ci] = _encode_one_block(
                bwiter, coefs[ci][n].flatten()[_ZZ], preds[ci], dcs[ci], acs[ci]
            )
    bwiter.flush()
    out += bwiter.buf
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    destuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos + 1 >= len(d):  # every valid stream ends in EOI
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        """Drop pad bits and step over an RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int) -> None:
        self.code = code


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Sequential-baseline JPEG -> (h, w, 3) uint8 RGB. Grayscale
    replicates luma; 3-component YCbCr converts back with the usual
    rounding; chroma subsampling (sampling factors 1-2 per axis)
    upsamples by pixel replication. Progressive/arithmetic/12-bit
    raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("desynced JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them, or the fill byte itself would read as a
        # bogus marker and its "length" would desync the walk
        # (code-review r16)
        while pos + 4 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            depth = data[0]
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth}")
            h, w = struct.unpack_from(">HH", data, 1)
            nc = data[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}: "
                "progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zzq = np.frombuffer(data, np.uint8, 64, p + 1).astype(np.int64)
                q = np.zeros(64, np.int64)
                q[_ZZ] = zzq
                qtabs[tq] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = [0] + list(data[p + 1 : p + 17])
                nsym = sum(bits)
                huffval = list(data[p + 17 : p + 17 + nsym])
                htabs[(tc, th)] = _huff_decode_table(bits, huffval)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = data[0]
            if ns != len(comps):
                # baseline JPEG may legally split its components over
                # several SOS scans; decoding just the first would
                # silently return a gray image for a color file —
                # gate loudly like progressive/12-bit (code-review r16)
                raise NotImplementedError(
                    f"multi-scan baseline JPEG (first scan covers {ns} of "
                    f"{len(comps)} components)"
                )
            scan = []
            for i in range(ns):
                cs, tt = data[1 + 2 * i], data[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            pos = pos + 2 + seg_len
            return _decode_scan(
                payload, pos, w, h, scan, qtabs, htabs, restart_interval
            )
        pos += 2 + seg_len
    raise ValueError("JPEG without SOS scan")


def _decode_scan(payload, pos, w, h, scan, qtabs, htabs, restart_interval):
    hmax = max(c["hs"] for c, _, _ in scan)
    vmax = max(c["vs"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for comp, _, _ in scan:
        pw, ph = mcux * 8 * comp["hs"], mcuy * 8 * comp["vs"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    # zigzagged quant table per scan component, hoisted out of the
    # per-8x8-block loop (it was re-flattened+fancy-indexed once per
    # block in the hottest decode loop; code-review r16)
    qzz = [qtabs[comp["tq"]].flatten()[_ZZ] for comp, _, _ in scan]
    br = _BitReader(payload, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                preds = [0] * len(scan)
            try:
                for ci, (comp, td, ta) in enumerate(scan):
                    for by in range(comp["vs"]):
                        for bx in range(comp["hs"]):
                            zz = np.zeros(64, dtype=np.int64)
                            s = _decode_huff(br, htabs[(0, td)])
                            diff = _extend(br.bits(s), s)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(br, htabs[(1, ta)])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                zz[k] = _extend(br.bits(s), s)
                                k += 1
                            blk = np.zeros(64, np.float64)
                            blk[_ZZ] = zz * qzz[ci]
                            f = _A.T @ blk.reshape(8, 8) @ _A + 128.0
                            y0 = (my * comp["vs"] + by) * 8
                            x0 = (mx * comp["hs"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = f
            except _RestartMarker:
                raise ValueError("restart marker misaligned with DRI") from None
            mcu_count += 1
    full = []
    for ci, (comp, _, _) in enumerate(scan):
        p = np.clip(np.round(planes[ci]), 0, 255).astype(np.uint8)
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.ascontiguousarray(np.stack([full[0]] * 3, axis=-1))
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component JPEG")


def synth_block_image(doc_id: int, size: int = 16, classes: int = 100):
    """Deterministic 8x8-BLOCK-CONSTANT grayscale-as-RGB test image:
    each 8x8 tile of the (size, size) image is one constant value
    derived from (doc_id % classes, tile index), plus a one-TILE
    clamped per-doc perturbation — same-class images are perceptual
    near-dups, classes differ widely (the ``synth_image`` contract,
    restricted to the block-constant subspace where baseline JPEG is
    EXACT — see module docstring). Pure integer math, replayable in
    SQL."""
    cls = doc_id % classes
    nb = size // 8
    y, x = np.mgrid[0:nb, 0:nb]
    # class-DEPENDENT gradient coefficients: a fixed (61, 29) slope
    # leaves distinct classes with correlated above-average bit
    # patterns (measured: 6x the intended pair count at sf0.1 — whole
    # 50x50 cross-class near-dup blocks); varying the slope per class
    # decorrelates the 64 threshold bits across classes while staying
    # one substitution away from SQL
    vals = (cls * 37 + x * (61 + cls) + y * (29 + 2 * cls)) % 256
    tile = doc_id % (nb * nb)
    ty, tx = tile // nb, tile % nb
    vals = vals.astype(np.int64)
    vals[ty, tx] = min(255, int(vals[ty, tx]) + (doc_id % 5))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)
