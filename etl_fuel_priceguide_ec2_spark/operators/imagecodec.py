"""Dependency-free image codec for the X5 real-codec path.

The container has no PIL/ffmpeg, so the multimodal operators' REAL
decode path supports the formats decodable in pure Python + numpy +
stdlib zlib: binary PPM (P6), 24-bit uncompressed BMP, and — as of
round 16 (VERDICT r15 item 2, the real-corpus formats) — 8-bit
non-interlaced PNG (grayscale / RGB / RGBA, all five scanline filter
types, DEFLATE via ``zlib``) and sequential-baseline JPEG
(``jpegcodec``: grayscale + YCbCr, 4:4:4/4:2:2/4:2:0, restart
markers). That is enough to exercise genuine bytes -> pixels ->
resize -> re-encode over the mapInPandas plumbing on the formats real
corpora actually carry; the remaining gaps (progressive JPEG,
palette/16-bit/interlaced PNG, video) slot into the same functions
when their libraries exist (same (width, height, rgb-ndarray)
contract) and raise loudly until then.

All functions are per-payload (called inside Arrow batch loops); none
touch Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PPM_MIME = "image/x-portable-pixmap"
BMP_MIME = "image/bmp"
PNG_MIME = "image/png"
JPEG_MIME = "image/jpeg"

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_mime(payload: bytes) -> str | None:
    """Detect a supported image format from magic bytes, else None."""
    if payload[:2] == b"P6":
        return PPM_MIME
    if payload[:2] == b"BM":
        return BMP_MIME
    if payload[:8] == _PNG_MAGIC:
        return PNG_MIME
    if payload[:3] == b"\xff\xd8\xff":
        return JPEG_MIME
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3, "PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Supports '#' comments and
    arbitrary whitespace in the header, per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # parse three header ints (w, h, maxval), skipping comments
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP."""
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    raster = payload[off : off + stride * h]
    if len(raster) != stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(img)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor non-interlaced PNG.

    Scanlines use filter type 0 (None) — simple and bit-exactly
    round-trippable; DEFLATE does the compressing. (A production
    encoder would pick per-row filters for ratio; decode-side we accept
    all five, see ``decode_png``.)"""
    h, w, c = img.shape
    assert c == 3, "encode_png writes truecolor RGB"
    rows = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * 3)
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)  # filter byte 0 + row
    raw[:, 1:] = rows
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (PNG spec 4.5.4, all five types).

    None/Up/Sub are numpy-vectorized (Sub is a per-byte-lane cumulative
    sum mod 256); Average and Paeth genuinely depend on the
    just-reconstructed left neighbor, so they run a per-byte loop —
    only on rows that actually use them (our own encoder never does)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            cur = line
            for lane in range(bpp):
                cur[lane::bpp] = (
                    np.cumsum(cur[lane::bpp], dtype=np.int64) % 256
                ).astype(np.uint8)
        elif ft == 2:  # Up (uint8 addition wraps mod 256 by itself)
            cur = line + prev
        elif ft == 3:  # Average: + floor((left + up) / 2), sequential
            c64 = line.astype(np.int64)
            p64 = prev.astype(np.int64)
            for x in range(stride):
                left = c64[x - bpp] if x >= bpp else 0
                c64[x] = (c64[x] + ((left + p64[x]) >> 1)) & 0xFF
            cur = c64.astype(np.uint8)
        elif ft == 4:  # Paeth, sequential
            c64 = line.astype(np.int64)
            p64 = prev.astype(np.int64)
            for x in range(stride):
                a = c64[x - bpp] if x >= bpp else 0
                b = p64[x]
                cc = p64[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                c64[x] = (c64[x] + pred) & 0xFF
            cur = c64.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (h, w, 3) uint8 RGB.

    Supported: color types 0 (grayscale, expanded to RGB), 2
    (truecolor) and 6 (truecolor+alpha — alpha DROPPED, not
    composited: perceptual hashing wants the color planes), bit depth
    8, interlace 0, all five filter types, multi-IDAT streams,
    ancillary chunks skipped. Palette (3), 16-bit, grayscale+alpha (4)
    and Adam7 raise loudly — feature gates, not silent misdecodes."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = color_type = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(
                    f"PNG bit depth {depth} unsupported (8 only)"
                )
            if color_type not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG color type {color_type} unsupported "
                    "(grayscale/RGB/RGBA only; palette needs PLTE handling)"
                )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG unsupported")
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG pixel stream")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color_type == 0:
        px = np.repeat(px, 3, axis=2)
    elif color_type == 6:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def decode(payload: bytes) -> np.ndarray:
    """Decode any supported format by magic bytes."""
    mime = sniff_mime(payload)
    if mime == PPM_MIME:
        return decode_ppm(payload)
    if mime == BMP_MIME:
        return decode_bmp(payload)
    if mime == PNG_MIME:
        return decode_png(payload)
    if mime == JPEG_MIME:
        from etl_fuel_priceguide_ec2_spark.operators import jpegcodec

        return jpegcodec.decode_jpeg(payload)
    raise NotImplementedError(
        "real codec supports PPM(P6)/BMP(24-bit)/PNG(8-bit)/"
        "baseline JPEG; video needs PIL/av"
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (target_h, target_w, 3) — vectorized
    numpy index maps, no Python pixel loop."""
    h, w, _ = img.shape
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return np.ascontiguousarray(img[yi][:, xi])
