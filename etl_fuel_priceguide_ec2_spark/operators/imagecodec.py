"""Dependency-free image codec for the X5 real-codec path.

The container has no PIL/ffmpeg, so the multimodal operators' REAL
decode path supports the two formats trivially decodable in pure
Python + numpy: binary PPM (P6) and 24-bit uncompressed BMP. That is
enough to exercise genuine bytes -> pixels -> resize -> re-encode over
the mapInPandas plumbing; richer codecs slot into the same functions
when their libraries exist (same (width, height, rgb-ndarray)
contract).

All functions are per-payload (called inside Arrow batch loops); none
touch Spark.
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MIME = "image/x-portable-pixmap"
BMP_MIME = "image/bmp"


def sniff_mime(payload: bytes) -> str | None:
    """Detect a supported image format from magic bytes, else None."""
    if payload[:2] == b"P6":
        return PPM_MIME
    if payload[:2] == b"BM":
        return BMP_MIME
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


def decode(payload: bytes) -> np.ndarray:
    """Decode any supported format by magic bytes."""
    mime = sniff_mime(payload)
    if mime == PPM_MIME:
        return decode_ppm(payload)
    if mime == BMP_MIME:
        return decode_bmp(payload)
    raise NotImplementedError(
        "real codec supports PPM(P6)/BMP(24-bit); other formats need PIL/av"
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (target_h, target_w, 3) — vectorized
    numpy index maps, no Python pixel loop."""
    h, w, _ = img.shape
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return np.ascontiguousarray(img[yi][:, xi])
