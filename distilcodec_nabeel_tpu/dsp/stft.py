"""STFT primitives, designed TPU-first.

The reference computes its linear spectrogram with ``torch.stft`` forced onto
the CPU (reference: distilcodec/models/mel_spec.py:26-57, the ``y = y.cpu()``
quirk at :39).  Here the whole front-end is expressed as framing + one big
matmul against a window-folded DFT basis, which XLA tiles straight onto the
MXU — no FFT butterflies, no host round-trip.  For n_fft=1024 the basis is a
(1024, 1026) fp32 matrix (~4 MB) that lives in HBM next to the weights and
streams through VMEM once per call.

Numerics match ``torch.stft(center=False, onesided=True, hann)`` to fp32
round-off (golden-tested against torch in tests/test_mel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Window-folded real-DFT basis.

    Returns a (win_length, 2*(n_fft//2+1)) matrix ``B`` such that for a frame
    ``f`` (length win_length), ``f @ B`` = [Re(X_0..X_F), Im(X_0..X_F)] of the
    one-sided DFT of the windowed frame, matching torch.stft's convention
    (negative sign in the exponent).
    """
    assert win_length <= n_fft
    n_freqs = n_fft // 2 + 1
    window = hann_window(win_length, dtype=np.float64)
    # torch.stft centers a short window inside n_fft; here win_length == n_fft
    # in all reference configs, but support the general case by zero-padding
    # the window placement the way torch does (centered).
    pad_left = (n_fft - win_length) // 2
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, n_freqs)
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # (n_fft, 2F)
    # fold window + centering: row i of the effective basis is
    # window[i] * basis[pad_left + i]
    eff = window[:, None] * basis[pad_left : pad_left + win_length]
    return eff.astype(np.float32)


def _frame_signal_impl(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    batch_shape = y.shape[:-1]
    length = y.shape[-1]
    num_frames = 1 + (length - frame_length) // hop
    x = y.reshape((-1, 1, length))
    # patches: (N, frame_length, T)
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )
    patches = jnp.transpose(patches, (0, 2, 1))  # (N, T, frame_length)
    return patches.reshape(batch_shape + (num_frames, frame_length))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _frame_signal_cv(y, frame_length: int, hop: int, length: int, dtype_name: str):
    return _frame_signal_impl(y, frame_length, hop)


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., L) -> (..., T, frame_length) with T = 1 + (L - frame_length)//hop.

    Forward: conv_general_dilated_patches — one strided gather XLA fuses with
    the consumer matmul.  Backward: custom VJP.  XLA's autodiff of the patch
    extraction is a transposed conv whose kernel is a (frame_length x
    frame_length) one-hot identity — for the MS-STFT's 2048-tap frames that's
    a dense matmul of 1/2048-density zeros, and it measured as the single
    largest cost in the GAN train step (the G-phase gradient through five
    STFT scales: 565 ms of a 1.74 s step at batch 8).  When hop divides
    frame_length (every reference config: win = 4*hop at all five scales +
    the mel front-end), the adjoint is exactly ``frame_length//hop`` shifted
    contiguous adds — bandwidth-bound, no matmul at all."""
    return _frame_signal_cv(
        y, frame_length, hop, y.shape[-1], jnp.dtype(y.dtype).name
    )


def _frame_signal_fwd(y, frame_length, hop, length, dtype_name):
    return _frame_signal_impl(y, frame_length, hop), None


def _frame_signal_bwd(frame_length, hop, length, dtype_name, res, g):
    batch_shape = g.shape[:-2]
    T = g.shape[-2]
    if frame_length % hop == 0:
        m = frame_length // hop
        # overlap-add: x_grad[(t+j)*hop + r] += g[t, j*hop + r]
        gr = g.reshape(batch_shape + (T, m, hop))
        out = jnp.zeros(batch_shape + (T + m - 1, hop), g.dtype)
        for j in range(m):
            out = out.at[..., j : j + T, :].add(gr[..., :, j, :])
        flat = out.reshape(batch_shape + ((T + m - 1) * hop,))
        covered = (T + m - 1) * hop  # == (T-1)*hop + frame_length
    else:
        # general case: scatter-add per frame offset (rare; none of the
        # reference configs hit it)
        flat = jnp.zeros(batch_shape + ((T - 1) * hop + frame_length,), g.dtype)
        for i in range(frame_length):
            flat = flat.at[..., i : i + (T - 1) * hop + 1 : hop].add(
                g[..., :, i]
            )
        covered = (T - 1) * hop + frame_length
    if covered < length:  # tail samples no frame touched get zero gradient
        pad = [(0, 0)] * len(batch_shape) + [(0, length - covered)]
        flat = jnp.pad(flat, pad)
    return (flat[..., :length].astype(jnp.dtype(dtype_name)),)


_frame_signal_cv.defvjp(_frame_signal_fwd, _frame_signal_bwd)


def _windowed_spec(y: jnp.ndarray, basis, win_length: int, hop_length: int) -> jnp.ndarray:
    """(..., L) fp32 -> (..., T, 2F): the window-folded DFT without ever
    materializing frames.

    When hop divides win (every reference config: win = 4*hop at the mel
    front-end and all five MS-STFT scales), frame t is the concatenation of
    m = win/hop consecutive hop-blocks, so ``frames @ basis`` is exactly a
    size-m convolution over the hop-blocked signal with the basis reshaped
    to an (m, hop, 2F) kernel:

        out[t, f] = sum_{j,h} y[(t+j)*hop + h] * basis[j*hop + h, f]

    The previous formulation (conv_general_dilated_patches -> transpose ->
    big matmul) materialized a (.., T, win) frames tensor (win/hop x the
    signal) and a relayouting transpose; measured on v5e at b16 x 3 s this
    was 2.5-6.3 ms PER MS-STFT SCALE against a ~0.5 ms flop+bandwidth bound
    (probe_msstft.py).  The conv form reads the signal once, needs no
    transpose, and its autodiff is a cheap k=m transposed conv — the
    one-hot-kernel adjoint pathology frame_signal's custom VJP worked
    around cannot arise at all.  Numerics: identical contraction at
    HIGHEST precision, split hop-blockwise (partial sums differ from the
    single matmul only at fp32 round-off).
    """
    m = win_length // hop_length
    batch_shape = y.shape[:-1]
    L = y.shape[-1]
    T = 1 + (L - win_length) // hop_length
    need = (T - 1 + m) * hop_length
    yb = y[..., :need].reshape((-1, T - 1 + m, hop_length))
    kernel = jnp.asarray(basis).reshape(m, hop_length, -1)
    spec = jax.lax.conv_general_dilated(
        yb,
        kernel,
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return spec.reshape(batch_shape + (T, kernel.shape[-1]))


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """``sqrt(|STFT|^2 + eps)`` magnitude of (..., L) -> (..., T, n_fft//2+1).

    center=False semantics: the caller is responsible for any padding
    (the reference reflect-pads with ((win-hop)//2, (win-hop+1)//2) before
    calling stft; see LinearSpectrogram, mel_spec.py:30-37).
    """
    n_freqs = n_fft // 2 + 1
    basis = _dft_basis(n_fft, win_length)
    if win_length % hop_length == 0:
        spec = _windowed_spec(
            y.astype(jnp.float32), basis, win_length, hop_length
        )
    else:
        frames = frame_signal(y.astype(jnp.float32), win_length, hop_length)
        spec = jnp.einsum(
            "...tw,wf->...tf",
            frames,
            jnp.asarray(basis),
            precision=jax.lax.Precision.HIGHEST,
        )
    re, im = spec[..., :n_freqs], spec[..., n_freqs:]
    return jnp.sqrt(re * re + im * im + eps)


def stft_complex(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    normalized: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag one-sided STFT (center=False). Used by the MS-STFT
    discriminator (reference: distilcodec/models/msstftd.py:153-161, which uses
    torchaudio Spectrogram(power=None, normalized=True, center=False))."""
    n_freqs = n_fft // 2 + 1
    basis = np.asarray(_dft_basis(n_fft, win_length))
    if normalized:
        # torchaudio "window" normalization: divide by sqrt(sum(win^2))
        win = hann_window(win_length, np.float64)
        basis = (basis / np.sqrt((win**2).sum())).astype(np.float32)
    if win_length % hop_length == 0:
        spec = _windowed_spec(
            y.astype(jnp.float32), basis, win_length, hop_length
        )
    else:
        frames = frame_signal(y.astype(jnp.float32), win_length, hop_length)
        spec = jnp.einsum(
            "...tw,wf->...tf",
            frames,
            jnp.asarray(basis),
            precision=jax.lax.Precision.HIGHEST,
        )
    re, im = spec[..., :n_freqs], spec[..., n_freqs:]
    return re, im


def reflect_pad_for_stft(y: jnp.ndarray, win_length: int, hop_length: int) -> jnp.ndarray:
    """The reference's asymmetric reflect pad before STFT
    (mel_spec.py:30-37): left (win-hop)//2, right (win-hop+1)//2."""
    left = (win_length - hop_length) // 2
    right = (win_length - hop_length + 1) // 2
    pad = [(0, 0)] * (y.ndim - 1) + [(left, right)]
    return jnp.pad(y, pad, mode="reflect")
