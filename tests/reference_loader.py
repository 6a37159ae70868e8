"""Import the reference PyTorch implementation for golden-parity tests.

The reference package (/root/reference) needs librosa / torchaudio / einx /
soundfile / vector_quantize_pytorch, none of which exist in this image.  We
stub just enough of them (einx.get_at is implemented for the one pattern the
reference uses) so the torch modules can be instantiated on CPU and compared
against our JAX implementation with identical random weights.

These stubs live only inside the test process; the production package never
touches them.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _install_stubs():
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")

        def _unavailable(*a, **k):
            raise RuntimeError("librosa stub: not available in tests")

        librosa.load = _unavailable
        librosa.resample = _unavailable
        sys.modules["librosa"] = librosa

    if "soundfile" not in sys.modules:
        soundfile = types.ModuleType("soundfile")
        soundfile.write = lambda *a, **k: None
        sys.modules["soundfile"] = soundfile

    if "torchaudio" not in sys.modules:
        import torch

        from distilcodec_nabeel_tpu.dsp import melscale_fbanks

        torchaudio = types.ModuleType("torchaudio")
        functional = types.ModuleType("torchaudio.functional")
        transforms = types.ModuleType("torchaudio.transforms")

        def _melscale_fbanks(
            n_freqs, f_min, f_max, n_mels, sample_rate, norm=None, mel_scale="htk"
        ):
            assert norm == "slaney" and mel_scale == "slaney"
            return torch.from_numpy(
                melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate)
            )

        def _resample(x, orig_freq, new_freq):
            raise RuntimeError("torchaudio.functional.resample stub")

        functional.melscale_fbanks = _melscale_fbanks
        functional.resample = _resample

        class MelScale:  # imported but unused by reference paths we test
            def __init__(self, *a, **k):
                pass

        class Spectrogram(torch.nn.Module):
            """center=False complex spectrogram, matching torchaudio semantics
            for the arguments msstftd.py uses."""

            def __init__(
                self,
                n_fft,
                hop_length,
                win_length,
                window_fn=torch.hann_window,
                normalized=False,
                center=False,
                pad_mode=None,
                power=None,
            ):
                super().__init__()
                assert power is None and center is False
                self.n_fft = n_fft
                self.hop_length = hop_length
                self.win_length = win_length
                self.normalized = normalized
                self.register_buffer("window", window_fn(win_length))

            def forward(self, x):
                shape = x.shape
                x = x.reshape(-1, shape[-1])
                spec = torch.stft(
                    x,
                    self.n_fft,
                    hop_length=self.hop_length,
                    win_length=self.win_length,
                    window=self.window,
                    center=False,
                    normalized=False,
                    onesided=True,
                    return_complex=True,
                )
                if self.normalized:
                    # torchaudio 'window' normalization (it does NOT use
                    # torch.stft's 1/sqrt(n_fft) flag)
                    spec = spec / self.window.pow(2.0).sum().sqrt()
                return spec.reshape(shape[:-1] + spec.shape[-2:])

        transforms.MelScale = MelScale
        transforms.Spectrogram = Spectrogram
        torchaudio.functional = functional
        torchaudio.transforms = transforms
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.functional"] = functional
        sys.modules["torchaudio.transforms"] = transforms

    if "einx" not in sys.modules:
        import torch

        einx = types.ModuleType("einx")

        def get_at(pattern, tensor, indices):
            # the reference uses exactly one pattern (residual_vq.py:123):
            # 'q [c] d, b n q -> q b n d'
            assert pattern == "q [c] d, b n q -> q b n d", pattern
            q = tensor.shape[0]
            out = []
            for qi in range(q):
                out.append(tensor[qi][indices[..., qi]])  # (b, n, d)
            return torch.stack(out, dim=0)

        def where(pattern, mask, a, b):
            # the reference's masked-padding path uses
            # 'b n, b n d, b n d -> b n d' and 'b n, b n ..., -> b n ...'
            # (vector_quantize_pytorch.py:1143-1157): broadcast the (b, n)
            # mask over trailing dims, scalar fallback value allowed.
            ref = a if torch.is_tensor(a) else b
            while mask.dim() < ref.dim():
                mask = mask.unsqueeze(-1)
            a_t = a if torch.is_tensor(a) else torch.full_like(ref, a)
            b_t = b if torch.is_tensor(b) else torch.full_like(ref, b)
            return torch.where(mask, a_t, b_t)

        einx.get_at = get_at
        einx.where = where
        sys.modules["einx"] = einx

    if "vector_quantize_pytorch" not in sys.modules:
        vqp = types.ModuleType("vector_quantize_pytorch")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("pip vector_quantize_pytorch stub")

        vqp.GroupedResidualFSQ = _Unavailable
        vqp.GroupedResidualVQ = _Unavailable
        sys.modules["vector_quantize_pytorch"] = vqp

    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")

        class UsageError(Exception):
            pass

        wandb.UsageError = UsageError
        wandb.init = lambda *a, **k: None
        wandb.log = lambda *a, **k: None
        sys.modules["wandb"] = wandb

    if "tensorboardX" not in sys.modules:
        sys.modules["tensorboardX"] = types.ModuleType("tensorboardX")


def load_reference():
    """Returns the reference ``distilcodec`` package (stubbed imports)."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import distilcodec  # noqa: F401

    return distilcodec
