"""Log-mel front-end.

Matches the reference's ``LogMelSpectrogram`` numerics (reference:
distilcodec/models/mel_spec.py:60-122): reflect-padded center=False STFT with a
periodic Hann window, ``sqrt(re^2+im^2+1e-6)`` magnitude, a slaney/slaney mel
filterbank matmul (torchaudio ``melscale_fbanks`` semantics, mel_spec.py:85-93)
and ``log(clamp(x, 1e-5))`` compression (mel_spec.py:100-101).

The reference forces its STFT onto the CPU (mel_spec.py:39); here everything is
one fused device computation: frame-gather -> DFT matmul -> magnitude -> mel
matmul -> log.  All matmuls hit the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .stft import reflect_pad_for_stft, stft_magnitude


def _hz_to_mel_slaney(freq: float) -> float:
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    if freq >= min_log_hz:
        return min_log_mel + math.log(freq / min_log_hz) / logstep
    return freq / f_sp


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    freqs = f_sp * mels
    log_t = mels >= min_log_mel
    freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    return freqs


@functools.lru_cache(maxsize=None)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Same algorithm as torchaudio.functional.melscale_fbanks(norm='slaney',
    mel_scale='slaney') used by the reference (mel_spec.py:85-93).
    Returns (n_freqs, n_mels) float32.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_slaney(f_min)
    m_max = _hz_to_mel_slaney(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney normalization: scale each filter to constant energy per band
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


class LogMelSpectrogram:
    """Functional log-mel transform.

    __call__ maps waveform (..., L) -> log-mel (..., n_mels, T) in the
    reference's channel layout (mel bins before time, mel_spec.py:106-107).
    """

    def __init__(
        self,
        sample_rate: int = 24000,
        n_fft: int = 1024,
        win_length: int = 1024,
        hop_length: int = 256,
        n_mels: int = 128,
        f_min: float = 0.0,
        f_max: float | None = None,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else float(sample_rate // 2)
        self.fb = melscale_fbanks(
            n_fft // 2 + 1, self.f_min, self.f_max, n_mels, sample_rate
        )

    def linear(self, y: jnp.ndarray) -> jnp.ndarray:
        """Linear magnitude spectrogram (..., T, n_freqs)."""
        if y.ndim == 3 and y.shape[1] == 1:
            y = y[:, 0]
        y = reflect_pad_for_stft(y, self.win_length, self.hop_length)
        return stft_magnitude(y, self.n_fft, self.hop_length, self.win_length)

    def __call__(self, y: jnp.ndarray, return_linear: bool = False):
        linear = self.linear(y)
        mel = jnp.einsum(
            "...tf,fm->...tm",
            linear,
            jnp.asarray(self.fb),
            precision=jax.lax.Precision.HIGHEST,
        )
        mel = compress(mel)
        # (..., T, M) -> (..., M, T) to match the reference layout
        mel = jnp.swapaxes(mel, -1, -2)
        if return_linear:
            return mel, compress(jnp.swapaxes(linear, -1, -2))
        return mel

    def num_frames(self, num_samples: int) -> int:
        padded = num_samples + (self.win_length - self.hop_length)
        return 1 + (padded - self.win_length) // self.hop_length


def compress(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log dynamic-range compression (mel_spec.py:100-101)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def decompress(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)
