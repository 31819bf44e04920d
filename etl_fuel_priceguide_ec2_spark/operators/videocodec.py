"""Dependency-free video container codec (X5 video tier, round 16).

Uncompressed RIFF/AVI with raw 24-bit RGB ("DIB ") frames — the one
video format decodable losslessly in pure Python + numpy, which is
exactly what makes the video tier ORACLE-ABLE: every sampled frame's
pixels replay in SQL bit-for-bit, the same property the PPM/PNG/
block-constant-JPEG image rows stand on. Compressed streams (MJPEG,
H.264, VP9, ...) raise loudly — provision PyAV/ffmpeg and extend
``decode_avi`` for those; the Spark-side plumbing (schema, fan-out,
per-frame hashing) is format-agnostic and already real.

Frame raster = the BMP layout (bottom-up rows, BGR, 4-byte row pad);
the container adds the RIFF chunk walk (hdrl: avih + strl/strh/strf;
movi: one 00db chunk per frame; idx1 written for player compatibility,
not needed to decode).

All functions are per-payload (called inside Arrow batch loops); none
touch Spark.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MIME = "video/x-msvideo"


def _frame_bytes(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> DIB raster (bottom-up, BGR, stride%4==0)."""
    h, w, _ = img.shape
    row = w * 3
    stride = (row + 3) // 4 * 4
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    return rows.tobytes()


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB -> uncompressed AVI (BI_RGB 24-bit)."""
    n, h, w, c = frames.shape
    assert c == 3, "encode_avi expects (n, h, w, 3) RGB"
    if n < 1:
        raise ValueError("encode_avi requires at least one frame")
    frame_raw = [_frame_bytes(frames[i]) for i in range(n)]
    frame_size = len(frame_raw[0])

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        usec_per_frame, frame_size * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<7I", 1, fps, 0, n, frame_size, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(chunk(b"00db", fr) for fr in frame_raw)
    movi = lst(b"movi", movi_chunks)
    # idx1: one entry per frame (offset relative to the movi list's
    # 'movi' fourcc, per convention)
    idx = bytearray()
    off = 4
    for fr in frame_raw:
        idx += b"00db" + struct.pack("<3I", 0x10, off, len(fr))
        off += 8 + len(fr) + (len(fr) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit AVI -> (n, h, w, 3) uint8 RGB frames.

    Frame dimensions and orientation come from strf's
    BITMAPINFOHEADER, not avih: biHeight is SIGNED — positive means
    bottom-up rows (the common DIB layout, un-flipped on decode),
    negative means top-down (legal and common for RGB; previously
    decoded vertically flipped with no error, code-review r16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    w = h = None
    top_down = False
    stream_type = None  # fccType of the most recent strh chunk
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, top_down, stream_type
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(data_start + 4, data_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, data_start)
                if w is None:  # strf (authoritative) may already have run
                    w, h = vals[8], vals[9]
            elif fourcc == b"strh":
                stream_type = payload[data_start : data_start + 4]
            elif fourcc == b"strf" and stream_type == b"vids":
                # strf's layout depends on the OWNING stream's type: a
                # 'vids' strf is a BITMAPINFOHEADER, an 'auds' strf is
                # a WAVEFORMATEX — parsing the latter as bitmap fields
                # read sample rates as dimensions and bits-per-sample
                # as bpp, failing (or worse) on any AVI that carries an
                # audio track beside its video (code-review r16)
                (
                    _bisize, bw, bh, _planes, bpp, comp,
                ) = struct.unpack_from("<IiiHHI", payload, data_start)
                if bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        f"compressed/non-24-bit AVI stream (bpp={bpp}, "
                        f"compression={comp}) — needs PyAV/ffmpeg"
                    )
                w, h = bw, abs(bh)
                top_down = bh < 0
            elif fourcc in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame before headers")
                stride = (w * 3 + 3) // 4 * 4
                raw = payload[data_start : data_start + stride * h]
                if len(raw) != stride * h:
                    raise ValueError("truncated AVI frame")
                rows = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, : w * 3]
                img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
                if not top_down:
                    img = img[::-1]  # bottom-up rows
                frames.append(np.ascontiguousarray(img))
            pos = data_start + size + (size % 2)

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI without frames")
    return np.stack(frames)


def synth_video_frames(
    doc_id: int, n_frames: int = 4, size: int = 16, classes: int = 100
) -> np.ndarray:
    """Deterministic (n_frames, size, size, 3) clip: frame f IS
    ``multimodal.synth_image(doc_id + f)`` — the established per-class
    gradient pattern with the id advanced per frame, so every frame's
    pixels replay in SQL with the one substitution did = doc_id + f.
    Consecutive frames differ (the class advances), which is what a
    frame-sampling pipeline wants to demonstrate."""
    from etl_fuel_priceguide_ec2_spark.operators.multimodal import synth_image

    return np.stack(
        [synth_image(doc_id + f, size, classes) for f in range(n_frames)]
    )
