"""Dependency-free WAV (RIFF/PCM-16) codec — the audio twin of
``functions/png.py``.

The container ships no audio library (librosa/soundfile/pydub), but
16-bit PCM WAV is parseable with the stdlib ``wave`` module alone, so
audio feature extraction in ``operators/multimodal.py`` can run on
REAL samples in CI instead of a byte-hash fake. Executors only ever
see these functions inside Arrow-batched ``mapInPandas`` — each call
is a pure function of the bytes, safe under task retries.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) > 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples (shape (n,) mono or (n, ch)) to WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to (samples, sample_rate); samples are int16
    with shape (n,) for mono or (n, ch) otherwise. Only PCM-16 is
    supported — anything else needs a real audio library."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV is supported, got sampwidth="
                f"{w.getsampwidth()}; other encodings need soundfile/librosa"
            )
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        arr = np.frombuffer(w.readframes(n), dtype="<i2")
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, sr


def audio_feature(samples: np.ndarray, dim: int = 16) -> list[float]:
    """Real signal-space feature: a dim-window RMS energy envelope,
    peak-normalized to [0, 1] — the shape a tiny audio encoder would
    produce, computed from actual decoded samples."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    windows = np.array_split(mono, dim)
    rms = np.array([np.sqrt(np.mean(w * w)) if w.size else 0.0 for w in windows])
    peak = rms.max()
    if peak <= 0:
        return [0.0] * dim
    return [float(v) for v in rms / peak]


def spectral_feature(
    samples: np.ndarray, sample_rate: int, dim: int = 16
) -> list[float]:
    """Real frequency-space feature: power-spectrum energy in ``dim``
    equal-width bands up to Nyquist, peak-normalized — an actual FFT
    over the decoded PCM samples (numpy.fft, no external DSP libs).
    A pure tone lands its energy in the band containing its
    frequency, which is what the unit test pins."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(mono.size, d=1.0 / sample_rate)
    nyquist = sample_rate / 2.0
    edges = np.linspace(0.0, nyquist, dim + 1)
    bands = np.zeros(dim)
    idx = np.clip(np.searchsorted(edges, freqs, side="right") - 1, 0, dim - 1)
    np.add.at(bands, idx, spec)
    peak = bands.max()
    if peak <= 0:
        return [0.0] * dim
    return [float(v) for v in bands / peak]
