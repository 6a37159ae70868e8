"""Golden tests for the mel front-end against torch.stft (the reference's STFT
engine, distilcodec/models/mel_spec.py:40-51) and an independent slaney
filterbank implementation."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from distilcodec_nabeel_tpu.dsp import (
    LogMelSpectrogram,
    hann_window,
    melscale_fbanks,
    reflect_pad_for_stft,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def torch_linear_spectrogram(y: np.ndarray, n_fft=1024, win=1024, hop=256):
    """Replicates reference LinearSpectrogram.forward (mel_spec.py:26-57)."""
    t = torch.from_numpy(y).float()
    t = torch.nn.functional.pad(
        t.unsqueeze(1), ((win - hop) // 2, (win - hop + 1) // 2), mode="reflect"
    ).squeeze(1)
    spec = torch.stft(
        t,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # (B, F, T)


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_torch(rng):
    y = rng.standard_normal((2, 25601)).astype(np.float32)
    ref = torch_linear_spectrogram(y)  # (2, 513, T)
    padded = reflect_pad_for_stft(jnp.asarray(y), 1024, 256)
    ours = np.asarray(stft_magnitude(padded, 1024, 256, 1024))  # (2, T, 513)
    ours = np.swapaxes(ours, -1, -2)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_frame_count_formula():
    m = LogMelSpectrogram()
    # 25600 + 1 left-pad sample is the reference's canonical preprocessing;
    # 25601 samples -> padded by 769 -> 100 frames (SURVEY shape flow).
    assert m.num_frames(25601) == 101 - 1


def _slaney_mel_scipy(f):
    """Independent slaney mel formula (librosa convention)."""
    f = np.asarray(f, dtype=np.float64)
    mels = f / (200.0 / 3)
    log_t = f >= 1000.0
    mels = np.where(
        log_t, 15.0 + np.log(np.maximum(f, 1e-12) / 1000.0) / (np.log(6.4) / 27.0), mels
    )
    return mels


def test_fbanks_against_independent_formula():
    fb = melscale_fbanks(513, 0.0, 12000.0, 128, 24000)
    assert fb.shape == (513, 128)
    # Independent reconstruction
    all_freqs = np.linspace(0, 12000, 513)
    m_pts = np.linspace(_slaney_mel_scipy(0.0), _slaney_mel_scipy(12000.0), 130)
    # invert
    f_pts = np.where(
        m_pts >= 15.0,
        1000.0 * np.exp((np.log(6.4) / 27.0) * (m_pts - 15.0)),
        (200.0 / 3) * m_pts,
    )
    fdiff = np.diff(f_pts)
    ramps = f_pts.reshape(-1, 1) - all_freqs.reshape(1, -1)
    fb2 = np.zeros((513, 128))
    for i in range(128):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb2[:, i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (f_pts[2:130] - f_pts[:128])
    fb2 *= enorm[None, :]
    np.testing.assert_allclose(fb, fb2, atol=1e-6)
    # each filter sums to something positive and the filterbank covers the band
    assert (fb.sum(axis=1) > 0).sum() > 500


def test_logmel_end_to_end_shape_and_range(rng):
    y = rng.standard_normal((3, 25601)).astype(np.float32) * 0.1
    m = LogMelSpectrogram()
    mel = np.asarray(m(jnp.asarray(y)))
    assert mel.shape == (3, 128, 100)
    assert np.isfinite(mel).all()
    assert mel.min() >= math.log(1e-5) - 1e-6


def test_logmel_matches_torch_reference_pipeline(rng):
    """Full reference pipeline in torch (stft+fbank matmul+log) vs ours."""
    y = rng.standard_normal((1, 24000)).astype(np.float32) * 0.3
    lin_ref = torch_linear_spectrogram(y)  # (1, 513, T)
    fb = melscale_fbanks(513, 0.0, 12000.0, 128, 24000)
    mel_ref = np.log(
        np.clip(
            np.einsum("bft,fm->bmt", lin_ref, fb),
            1e-5,
            None,
        )
    )
    m = LogMelSpectrogram(f_max=12000.0)
    mel = np.asarray(m(jnp.asarray(y)))
    np.testing.assert_allclose(mel, mel_ref, rtol=1e-3, atol=2e-3)


def test_frame_signal_custom_vjp_matches_autodiff(rng):
    """The overlap-add adjoint (custom VJP) must equal XLA's autodiff of the
    patch-extraction forward — divisible hop (all reference configs),
    non-divisible hop (generic fallback), ragged tails, batched dims."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.dsp.stft import (
        _frame_signal_impl,
        frame_signal,
    )

    cases = [
        ((2, 4096), 1024, 256),   # win=4*hop, exact cover
        ((2, 4097), 1024, 256),   # ragged tail -> zero grads there
        ((1, 515), 512, 128),     # short stream
        ((2, 1000), 300, 70),     # hop does not divide frame_length
        ((2, 3, 2048), 256, 64),  # extra leading batch dim
    ]
    for shape, fl, hop in cases:
        y = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ct = jnp.asarray(
            rng.standard_normal(frame_signal(y, fl, hop).shape).astype(
                np.float32
            )
        )
        g_custom = jax.grad(
            lambda x: jnp.sum(frame_signal(x, fl, hop) * ct)
        )(y)
        g_ref = jax.grad(
            lambda x: jnp.sum(_frame_signal_impl(x, fl, hop) * ct)
        )(y)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_ref), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(frame_signal(y, fl, hop)),
            np.asarray(_frame_signal_impl(y, fl, hop)),
        )
