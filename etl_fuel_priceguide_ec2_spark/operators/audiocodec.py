"""Dependency-free REAL audio codec: 16-bit mono PCM WAV encode/decode
via the stdlib ``wave`` module + numpy (no soundfile/librosa in this
container — same from-scratch-codec posture as ``imagecodec`` for
PPM/BMP).

The engine-side contract is (sample_rate, int16 numpy array); anything
that produces that tuple — a real librosa/av decoder once provisioned —
slots into the same ``audio_waveform_stats`` plumbing unchanged.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes (PCM, 1 channel)."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, int16 mono samples). Only the
    16-bit mono PCM profile this engine writes; other profiles raise
    (the NotImplementedError gate, as with non-PPM/BMP images)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit mono PCM supported (got {w.getnchannels()}ch/"
                f"{w.getsampwidth() * 8}-bit)"
            )
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    return rate, np.frombuffer(raw, dtype=np.int16)


def synth_sawtooth(doc_id: int, n_samples: int = 4000) -> np.ndarray:
    """Deterministic integer sawtooth keyed on the doc id — the
    trig-free synthetic signal that makes waveform statistics exactly
    mirrorable in SQL: sample[i] = ((doc_id * 31 + i * 7) % 2048) - 1024.
    No floats anywhere, so every engine computes identical samples."""
    i = np.arange(n_samples, dtype=np.int64)
    return (((doc_id * 31 + i * 7) % 2048) - 1024).astype(np.int16)


def synth_class_tone(
    doc_id: int, n_samples: int = 4000, classes: int = 100
) -> np.ndarray:
    """Class-structured deterministic signal — the audio analogue of
    ``multimodal.synth_image``: every doc in class ``doc_id % classes``
    shares one integer sawtooth (class-keyed phase AND step, so classes
    differ in both pitch and alignment), plus a one-sample per-doc
    perturbation — same-class docs are perceptual near-dups (band
    energies shift by <= 8 of ~30k) while classes differ broadly.
    Pure integer math, replayable in SQL:
      base[i] = ((cls*31 + i*(5 + 2*(cls%7))) % 2048) - 1024
      base[doc_id % n_samples] += doc_id % 9
    """
    cls = doc_id % classes
    step = 5 + 2 * (cls % 7)
    i = np.arange(n_samples, dtype=np.int64)
    s = ((cls * 31 + i * step) % 2048) - 1024
    s[doc_id % n_samples] += doc_id % 9
    return s.astype(np.int16)
