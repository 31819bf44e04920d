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


# powers of two for vectorized bit_length: size = searchsorted(_POW2, |v|,
# 'right') gives |v|.bit_length() for |v| < 2^16 (JPEG magnitudes are <= 11
# bits for 8-bit baseline, but quantization of adversarial input can reach
# the full DCT range, so cover 16)
_POW2 = np.array([1 << i for i in range(17)], dtype=np.int64)


def _pack_items(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """MSB-first bit packing of variable-length items with JPEG byte
    stuffing — the vectorized equivalent of a :class:`_BitWriter`
    write-per-item loop followed by ``flush()`` (1-padding to a byte
    boundary, 0x00 appended after every 0xFF)."""
    lens = lens.astype(np.int64)
    vals = vals.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return b""
    ends = np.cumsum(lens)
    starts = ends - lens
    item = np.repeat(np.arange(lens.shape[0]), lens)
    j = np.arange(total) - starts[item]
    bits = ((vals[item] >> (lens[item] - 1 - j)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    packed = np.packbits(bits)
    stuffed = np.insert(packed, np.flatnonzero(packed == 0xFF) + 1, 0)
    return stuffed.tobytes()


def _entropy_encode(
    qzz_by_comp: list[np.ndarray],
    interleave: list[int],
    dc_codes: list[dict],
    ac_codes: list[dict],
) -> bytes:
    """Entropy-code quantized zigzag blocks, vectorized.

    ``qzz_by_comp``: per component, an (n_i, 64) int64 array of
    zigzagged quantized blocks in that component's scan order.
    ``interleave``: component index sequence of ONE MCU (e.g. ``[0]``
    for grayscale, ``[0, 1, 2]`` for 4:4:4) — repeated over all MCUs it
    yields the global block order. Per-block symbol semantics (DC
    diff/magnitude, ZRL, EOB, per-component predictors) follow T.81
    F.1.2 exactly; the byte stream is bit-identical to the former
    per-symbol ``_BitWriter`` loop (property-tested in
    tests/test_sinks_sources.py round-trips)."""
    ncomp = len(qzz_by_comp)
    # ---- per component: vectorized (value, nbits) item streams -------
    # every item merges a Huffman code and its amplitude bits into one
    # integer (code << size | amp, length huff_len + size) <= 27 bits
    comp_items: list[tuple] = []  # (vals, lens, block_pos, rank)
    for ci in range(ncomp):
        qzz = qzz_by_comp[ci]
        n = qzz.shape[0]
        if n == 0:
            comp_items.append((
                np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64),
            ))
            continue
        dc_code = np.zeros(17, np.int64)
        dc_len = np.zeros(17, np.int64)
        for s, (c, ln) in dc_codes[ci].items():
            dc_code[s], dc_len[s] = c, ln
        ac_code = np.zeros(256, np.int64)
        ac_len = np.zeros(256, np.int64)
        for s, (c, ln) in ac_codes[ci].items():
            ac_code[s], ac_len[s] = c, ln
        # DC: diff against the per-component predictor chain
        dc = qzz[:, 0]
        diff = dc - np.concatenate([np.zeros(1, np.int64), dc[:-1]])
        size = np.searchsorted(_POW2, np.abs(diff), side="right").astype(np.int64)
        size[diff == 0] = 0
        amp = np.where(diff >= 0, diff, diff + (1 << size) - 1)
        dc_vals = (dc_code[size] << size) | amp
        dc_lens = dc_len[size] + size
        dc_blocks = np.arange(n, dtype=np.int64)
        dc_rank = np.zeros(n, np.int64)
        # AC: nonzero coefficients with ZRL expansion
        nzb, nzk = np.nonzero(qzz[:, 1:])
        k = (nzk + 1).astype(np.int64)
        v = qzz[nzb, k]
        first_of_block = np.concatenate(
            [np.ones(1, bool), nzb[1:] != nzb[:-1]]
        ) if nzb.shape[0] else np.zeros(0, bool)
        prev_k = np.concatenate([np.zeros(1, np.int64), k[:-1]]) if k.shape[0] else k
        prev_k = np.where(first_of_block, 0, prev_k)
        run = k - prev_k - 1
        asize = np.searchsorted(_POW2, np.abs(v), side="right").astype(np.int64)
        aamp = np.where(v >= 0, v, v + (1 << asize) - 1)
        sym = ((run & 15) << 4) | asize
        ac_vals_e = (ac_code[sym] << asize) | aamp
        ac_lens_e = ac_len[sym] + asize
        nzrl = run >> 4
        # expand: nzrl ZRL items then the coefficient item, per entry
        items_per_entry = nzrl + 1
        tot_ac = int(items_per_entry.sum())
        ac_vals = np.full(tot_ac, ac_code[0xF0], np.int64)
        ac_lens = np.full(tot_ac, ac_len[0xF0], np.int64)
        entry_end = np.cumsum(items_per_entry) - 1
        ac_vals[entry_end] = ac_vals_e
        ac_lens[entry_end] = ac_lens_e
        ac_blocks = np.repeat(nzb.astype(np.int64), items_per_entry)
        # within-block rank: DC=0, AC items 1..m in stream order
        if tot_ac:
            block_first = np.concatenate(
                [np.ones(1, bool), ac_blocks[1:] != ac_blocks[:-1]]
            )
            idx = np.arange(tot_ac, dtype=np.int64)
            block_start = idx[block_first]
            ac_rank = idx - np.repeat(
                block_start, np.diff(np.concatenate([block_start, [tot_ac]]))
            ) + 1
        else:
            ac_rank = np.zeros(0, np.int64)
        # EOB for every block whose last nonzero sits before k=63
        last_nz = np.zeros(n, np.int64)
        if k.shape[0]:
            np.maximum.at(last_nz, nzb, k)
        eob_blocks = np.flatnonzero(last_nz < 63).astype(np.int64)
        eob_vals = np.full(eob_blocks.shape[0], ac_code[0x00], np.int64)
        eob_lens = np.full(eob_blocks.shape[0], ac_len[0x00], np.int64)
        eob_rank = np.full(eob_blocks.shape[0], 1 << 20, np.int64)
        comp_items.append((
            np.concatenate([dc_vals, ac_vals, eob_vals]),
            np.concatenate([dc_lens, ac_lens, eob_lens]),
            np.concatenate([dc_blocks, ac_blocks, eob_blocks]),
            np.concatenate([dc_rank, ac_rank, eob_rank]),
        ))
    # ---- global interleave: order items by (MCU, slot, rank) ---------
    # component ci's block b sits at global position b * len(interleave)
    # + slot(ci) when each component contributes one block per MCU (the
    # only layouts this encoder emits: grayscale and 4:4:4)
    slot_of_comp = {c: s for s, c in enumerate(interleave)}
    nslots = len(interleave)
    all_vals, all_lens, all_pos, all_rank = [], [], [], []
    for ci in range(ncomp):
        vals, lens, blocks, rank = comp_items[ci]
        all_vals.append(vals)
        all_lens.append(lens)
        all_pos.append(blocks * nslots + slot_of_comp[ci])
        all_rank.append(rank)
    vals = np.concatenate(all_vals)
    lens = np.concatenate(all_lens)
    order = np.lexsort((np.concatenate(all_rank), np.concatenate(all_pos)))
    return _pack_items(vals[order], lens[order])


def _quantize_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial blocks -> (n, 64) zigzagged quantized int64.

    The DCT runs as two batched BLAS matmuls (A @ f @ A'), ~15x faster
    than the former naive einsum. FP note: summation order differs from
    einsum by ~1e-13, which can flip round() on knife-edge coefficients
    of arbitrary images (valid either way — the codec is lossy there);
    on the oracle-bearing block-constant subspace no coefficient sits
    near a rounding boundary (AC are exact 0, DC = 8*(v-128) whose /q00
    quotient has no .5 fraction for any q00 <= 7), verified
    byte-identical over the whole fixture id range."""
    coefs = np.matmul(np.matmul(_A, blocks - 128.0), _A.T)
    qc = np.round(coefs / q).astype(np.int64)
    return qc.reshape(-1, 64)[:, _ZZ]


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
        blocks, _, _ = _tile_blocks(gray)
        out += _entropy_encode(
            [_quantize_blocks(blocks, lq)], [0], [dc_l], [ac_l]
        )
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
    # 4:4:4 interleaved scan: one block per component per MCU, raster
    # order; per-component DC predictors
    qs = [lq, cq, cq]
    out += _entropy_encode(
        [_quantize_blocks(t[0], qs[i]) for i, t in enumerate(tiled)],
        [0, 1, 2],
        [dc_l, dc_c, dc_c],
        [ac_l, ac_c, ac_c],
    )
    out += b"\xff\xd9"
    return bytes(out)


def _entropy_segments(payload: bytes, pos: int) -> list[np.ndarray]:
    """The entropy-coded data starting at ``pos``, split at RSTn
    markers and destuffed (0xFF00 -> 0xFF), as uint8 arrays — one per
    restart interval. The scan ends at the first marker byte that is
    neither stuffing nor RSTn (EOI in a valid stream)."""
    arr = np.frombuffer(payload, np.uint8)
    n = arr.shape[0]
    ff = np.flatnonzero(arr[pos : n - 1] == 0xFF) + pos
    nxt = arr[ff + 1] if ff.size else np.zeros(0, np.uint8)
    stuff = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    term = ff[~stuff & ~rst]
    end = int(term[0]) if term.size else n
    segments = []
    start = pos
    for rp in ff[rst & (ff < end)].tolist():
        segments.append(arr[start:rp])
        start = rp + 2
    segments.append(arr[start:end])
    out = []
    for seg in segments:
        if seg.size:
            drop = np.zeros(seg.size, bool)
            ffp = np.flatnonzero(seg[:-1] == 0xFF)
            drop[ffp + 1] = seg[ffp + 1] == 0
            seg = seg[~drop]
        out.append(seg)
    return out


# 16-bit-window Huffman LUTs, memoized on the table definition: JPEG
# tables are tiny and almost always the Annex-K standard ones, and the
# 65536-entry fill is ~1 ms — worth paying once per table, not per image
_HUFF_LUT_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}


def _huff_lut(bits, huffval) -> tuple[list[int], list[int]]:
    """(bits, huffval) -> (symbol, length) lookup tables indexed by the
    NEXT 16 bits of the stream — every canonical code of length L owns
    the 2^(16-L) windows sharing its prefix. Length 0 marks an invalid
    code. Derived from :func:`_huff_codes` so the Annex-C walk keeps its
    one definition (the round-16 encoder/decoder-divergence guard)."""
    key = (tuple(bits), tuple(huffval))
    cached = _HUFF_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    sym = np.zeros(65536, np.int32)
    ln = np.zeros(65536, np.int32)
    for s, (code, length) in _huff_codes(bits, huffval).items():
        start = code << (16 - length)
        sym[start : start + (1 << (16 - length))] = s
        ln[start : start + (1 << (16 - length))] = length
    lut = (sym.tolist(), ln.tolist())
    _HUFF_LUT_CACHE[key] = lut
    return lut


def _bit_windows(seg: np.ndarray) -> list[int]:
    """Destuffed entropy bytes -> per-bit-position 16-bit lookahead
    windows (bits past the end read as 0), as a Python list — scalar
    indexing in the symbol loop is ~3x faster on a list than on the
    ndarray."""
    bits = np.unpackbits(seg)
    nb = bits.shape[0]
    padded = np.concatenate([bits, np.zeros(16, np.uint8)]).astype(np.int64)
    win = np.zeros(nb, np.int64)
    for i in range(16):
        win += padded[i : i + nb] << (15 - i)
    return win.tolist()


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
                htabs[(tc, th)] = _huff_lut(bits, huffval)
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
    total_mcus = mcux * mcuy
    blocks_per_mcu = sum(c["hs"] * c["vs"] for c, _, _ in scan)
    # ---- symbol decode: 16-bit-window LUT walk over destuffed bits ---
    # (replaces the per-bit reader: one list index + add per Huffman
    # code instead of up to 16 method calls; round-16 hot loop)
    segments = _entropy_segments(payload, pos)
    if restart_interval:
        exp = [restart_interval] * (total_mcus // restart_interval)
        if total_mcus % restart_interval:
            exp.append(total_mcus % restart_interval)
    else:
        exp = [total_mcus]
    if len(segments) != len(exp):
        raise ValueError("restart marker misaligned with DRI")
    # per-MCU slot list: (scan index, dc LUTs, ac LUTs) per block
    slots = []
    for ci, (comp, td, ta) in enumerate(scan):
        dc_sym, dc_len = htabs[(0, td)]
        ac_sym, ac_len = htabs[(1, ta)]
        for _ in range(comp["vs"] * comp["hs"]):
            slots.append((ci, dc_sym, dc_len, ac_sym, ac_len))
    # plain-list accumulators: DC per block, sparse (block, k, value)
    # AC triples — scattered into the coefficient matrix in one
    # vectorized pass after the symbol walk (per-element ndarray writes
    # were ~40% of decode time)
    dc_out: list[int] = []
    ac_b: list[int] = []
    ac_k: list[int] = []
    ac_v: list[int] = []
    bi = 0
    last_seg = len(segments) - 1
    for si, (seg, m) in enumerate(zip(segments, exp)):
        wl = _bit_windows(seg)
        nb = len(wl)
        p = 0
        preds = [0] * len(scan)
        try:
            for _ in range(m):
                for ci, dc_sym, dc_len, ac_sym, ac_len in slots:
                    w0 = wl[p]
                    ln = dc_len[w0]
                    if ln == 0:
                        raise ValueError("invalid Huffman code in JPEG stream")
                    s = dc_sym[w0]
                    p += ln
                    if s:
                        if p + s > nb:
                            raise IndexError
                        v = wl[p] >> (16 - s)
                        p += s
                        preds[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    dc_out.append(preds[ci])
                    k = 1
                    while k < 64:
                        w0 = wl[p]
                        ln = ac_len[w0]
                        if ln == 0:
                            raise ValueError("invalid Huffman code in JPEG stream")
                        rs = ac_sym[w0]
                        p += ln
                        s = rs & 0xF
                        if s == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC index overflow")
                        if p + s > nb:
                            raise IndexError
                        v = wl[p] >> (16 - s)
                        p += s
                        ac_b.append(bi)
                        ac_k.append(k)
                        ac_v.append(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                        k += 1
                    bi += 1
        except IndexError:
            # bits exhausted mid-MCU: an early RST boundary if more
            # segments follow, else a truncated stream
            raise ValueError(
                "restart marker misaligned with DRI"
                if si < last_seg
                else "truncated JPEG entropy stream"
            ) from None
    zz = np.zeros((total_mcus * blocks_per_mcu, 64), dtype=np.int64)
    zz[:, 0] = dc_out
    if ac_b:
        zz[ac_b, ac_k] = ac_v
    # ---- dequantize + IDCT, batched over every block ------------------
    comp_of_block = np.tile(
        np.array([s[0] for s in slots], dtype=np.int64), total_mcus
    )
    qzz = np.stack([qtabs[comp["tq"]].flatten()[_ZZ] for comp, _, _ in scan])
    blk = np.zeros((zz.shape[0], 64), np.float64)
    blk[:, _ZZ] = zz * qzz[comp_of_block]
    f = np.matmul(np.matmul(_A.T, blk.reshape(-1, 8, 8)), _A) + 128.0
    # ---- scatter blocks into component planes (vectorized) -----------
    full = []
    mcu = np.arange(total_mcus, dtype=np.int64)
    my, mx = mcu // mcux, mcu % mcux
    offsets = np.cumsum([0] + [c["vs"] * c["hs"] for c, _, _ in scan])
    for ci, (comp, _, _) in enumerate(scan):
        vs, hs = comp["vs"], comp["hs"]
        nby, nbx = mcuy * vs, mcux * hs
        # global block indices of this component, MCU raster order
        gidx = (
            mcu[:, None] * blocks_per_mcu
            + offsets[ci]
            + np.arange(vs * hs, dtype=np.int64)[None, :]
        ).reshape(-1)
        by, bx = np.divmod(np.arange(vs * hs, dtype=np.int64), hs)
        rows = (my[:, None] * vs + by[None, :]).reshape(-1)
        cols = (mx[:, None] * hs + bx[None, :]).reshape(-1)
        pb = np.zeros((nby * nbx, 8, 8), np.float64)
        pb[rows * nbx + cols] = f[gidx]
        plane = (
            pb.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        p8 = np.clip(np.round(plane), 0, 255).astype(np.uint8)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            p8 = np.repeat(np.repeat(p8, ry, axis=0), rx, axis=1)
        full.append(p8[:h, :w])
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
