"""Audio file IO + resampling.

The reference uses librosa/soundfile (distilcodec/distil_codec.py:12-14,
:657-684); neither ships in this image, so WAV IO is built on scipy/stdlib and
resampling on polyphase filtering (scipy.signal.resample_poly).  Amplitude
convention matches librosa.load: PCM is scaled to [-1, 1) float32.
"""

from __future__ import annotations

import math
import os

import numpy as np


def load_wav(path: str, sr: int | None = None) -> tuple[np.ndarray, int]:
    """Load a .wav file as mono-or-multichannel float32 in [-1, 1).

    Returns (audio, sample_rate); resamples to ``sr`` when given (the
    reference's ``load_wav`` semantics, distilcodec/models/meldataset.py:18-20,
    which loads mono at the target rate).  Non-WAV formats (mp3/flac/ogg —
    the reference decodes them through librosa/audioread/ffmpeg,
    distil_codec.py:657-684) route to the native libav decoder."""
    from scipy.io import wavfile

    try:
        rate, data = wavfile.read(path)
    except ValueError:
        from .. import native

        if native.has_ffmpeg():
            # native decode, then the shared scipy-exact resample below
            audio, rate = native.load_wav(path)
            if sr is not None and rate != sr:
                audio = resample(audio, rate, sr)
                rate = sr
            return audio, rate
        raise
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:  # (frames, channels) -> mono mean like librosa mono
        audio = audio.mean(axis=1)
    if sr is not None and rate != sr:
        audio = resample(audio, rate, sr)
        rate = sr
    return audio, rate


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 audio to 16-bit PCM WAV (soundfile.write equivalent)."""
    from scipy.io import wavfile

    audio = np.asarray(audio, dtype=np.float32)
    pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    wavfile.write(path, sample_rate, pcm)


def resample(
    audio: np.ndarray,
    orig_sr: int,
    target_sr: int,
    method: str = "poly",
) -> np.ndarray:
    """Rational-rate resampling (librosa.resample's role in the reference
    pipeline, distil_codec.py:657-684).

    * ``poly`` (default) — scipy ``resample_poly`` with its default
      Kaiser(beta=5) design: the fast pipeline filter.
    * ``kaiser_best`` — a librosa/resampy ``kaiser_best``-class design
      (64 zero-crossings, Kaiser beta 14.7697, rolloff 0.9475): the
      high-attenuation linear-phase sinc family librosa's classic resampler
      and soxr-HQ belong to.  Use for parity comparisons against the
      reference's librosa path (soxr itself is unavailable offline; the
      measured token flip rate between these two designs bounds the
      resampler-choice sensitivity — tests/test_resampler_parity.py).
    """
    if orig_sr == target_sr:
        return audio
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    if method == "poly":
        return resample_poly(audio, up, down, axis=-1).astype(np.float32)
    if method == "kaiser_best":
        from scipy.signal import firwin

        # resampy kaiser_best constants (Smith's windowed-sinc method):
        # 64 zero-crossings at the lower rate, rolloff 0.9475, beta 14.7697.
        num_zeros, rolloff, beta = 64, 0.9475, 14.769656459379492
        max_rate = max(up, down)
        taps = firwin(
            2 * num_zeros * max_rate + 1,
            rolloff / max_rate,
            window=("kaiser", beta),
        )
        # resample_poly scales an array window by ``up`` itself (verified:
        # unity-DC taps give passband gain 1.0 without extra scaling)
        return resample_poly(audio, up, down, axis=-1, window=taps).astype(
            np.float32
        )
    raise ValueError(f"unknown resample method {method!r}")


def load_and_resample_audio(
    file_path: str,
    target_sr: int,
    mono: bool = True,
    limited: float | None = None,
    rng: np.random.Generator | None = None,
):
    """Reference ``load_and_resample_audio`` (distil_codec.py:657-684):
    returns (audio (1, L) float32, target_sr, original duration seconds)."""
    y, orig_sr = load_wav(file_path)
    duration = len(y) / orig_sr
    if (
        limited is not None
        and duration > limited
        and len(y) - int(orig_sr * limited) > 1000
    ):
        rng = rng or np.random.default_rng()
        start = int(rng.integers(0, len(y) - int(orig_sr * limited)))
        y = y[start : start + int(orig_sr * limited)]
    y = resample(y, orig_sr, target_sr)
    if y.ndim == 1:
        y = y[None, :]
    elif mono and y.ndim > 1:
        y = y.mean(axis=0, keepdims=True)
    return y.astype(np.float32), target_sr, duration
