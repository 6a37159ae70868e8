"""Multi-Scale STFT discriminator.

Behavioral twin of the reference MS-STFT discriminator
(distilcodec/models/msstftd.py:107-269, EnCodec lineage): 5 complex-STFT
sub-discriminators at n_fft {1024,2048,512,256,128}; each takes the
window-normalized center=False complex STFT, stacks (re, im) as channels, and
runs 2-D convs with time dilations 1,2,4 and frequency stride 2, LeakyReLU 0.2.

Reference details honored: the *first* conv is built without a norm argument
and is therefore unnormalized (msstftd.py:163-169 — NormConv2d defaults to
norm='none'); the inner convs + post conv are weight-normed.  The reference's
broken 'layer_norm' branch (ConvLayerNorm.forward returns None,
msstftd.py:72-76) is NOT reproduced; only the norms actually exercised are
implemented.

The STFT itself is our MXU DFT-matmul (dsp/stft.py), not a CPU torch call.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..dsp.stft import stft_complex
from .discriminators import WNConv2d


def _get_2d_padding(kernel_size: tuple, dilation: tuple = (1, 1)) -> tuple:
    return (
        ((kernel_size[0] - 1) * dilation[0]) // 2,
        ((kernel_size[1] - 1) * dilation[1]) // 2,
    )


class DiscriminatorSTFT(nn.Module):
    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tuple = (3, 9)
    dilations: Sequence[int] = (1, 2, 4)
    stride: tuple = (1, 2)
    # exact freq->lane packing of every conv (see WNConv2d._freq_packed):
    # the 32-channel convs otherwise use 32 of 128 lanes and their gradient
    # buffers tile-pad ~5x (the batch-19 OOM offender, TODO.md).  None falls
    # back to the DISTILCODEC_MSSTFT_PACK env var; 0 disables; the string
    # "chain" selects the chain-packed stack (r4): activations stay packed
    # across ALL convs (WNConv2d chain mode — no per-conv pack/unpack
    # relayouts, the measured bandwidth sink, probe_msstft.py), fmaps are
    # returned PACKED as (array, scale) pairs where scale corrects the
    # feature-matching mean for the zero tail (losses.feature_loss handles
    # them), and only the tiny logits are unpacked.  Values and gradients
    # identical to the plain stack (tests/test_msstftd_chain.py).
    freq_pack: int | str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) waveform -> (logits (B, H, W, 1), fmaps)."""
        import os

        pack = self.freq_pack
        if pack is None:
            env = os.environ.get("DISTILCODEC_MSSTFT_PACK", "0") or 0
            pack = env if env == "chain" else int(env)
        if pack == "chain":
            return self._chain_call(x)
        # STFT always in fp32 (small; the reference's torchaudio Spectrogram
        # runs fp32 too); only the conv stack follows the input dtype
        re, im = stft_complex(
            x.astype(jnp.float32),
            self.n_fft,
            self.hop_length,
            self.win_length,
            normalized=True,
        )  # (B, frames, F) each
        z = jnp.stack([re, im], axis=-1).astype(x.dtype)  # (B, T', F, 2)
        fmap = []
        # first conv: NOT weight-normed (reference msstftd.py:163-169)
        z = WNConv2d(
            self.filters,
            self.kernel_size,
            padding=_get_2d_padding(self.kernel_size),
            use_weight_norm=False,
            freq_pack=pack,
            name="convs_0",
        )(z)
        z = nn.leaky_relu(z, 0.2)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min(
                (self.filters_scale ** (i + 1)) * self.filters, self.max_filters
            )
            z = WNConv2d(
                out_chs,
                self.kernel_size,
                strides=self.stride,
                dilation=(dilation, 1),
                padding=_get_2d_padding(self.kernel_size, (dilation, 1)),
                freq_pack=pack,
                name=f"convs_{i + 1}",
            )(z)
            z = nn.leaky_relu(z, 0.2)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        k0 = self.kernel_size[0]
        z = WNConv2d(
            out_chs,
            (k0, k0),
            padding=_get_2d_padding((k0, k0)),
            freq_pack=pack,
            name=f"convs_{len(self.dilations) + 1}",
        )(z)
        z = nn.leaky_relu(z, 0.2)
        fmap.append(z)
        z = WNConv2d(
            self.out_channels,
            (k0, k0),
            padding=_get_2d_padding((k0, k0)),
            freq_pack=pack,
            name="conv_post",
        )(z)
        return z, fmap

    def _chain_call(self, x: jnp.ndarray):
        """Chain-packed forward (freq_pack == "chain"): same math, same
        parameter tree; fmaps are (packed_array, fm_scale) pairs and the
        logits are unpacked at the exit.  fm_scale = padded/true element
        count, so mean(|fr - fg|) over the zero-tailed packed arrays times
        fm_scale equals the unpacked feature-matching mean exactly."""
        from .discriminators import CHAIN_P, chain_pack, chain_unpack

        re, im = stft_complex(
            x.astype(jnp.float32),
            self.n_fft,
            self.hop_length,
            self.win_length,
            normalized=True,
        )
        z = jnp.stack([re, im], axis=-1).astype(x.dtype)  # (B, T', F, 2)
        J = z.shape[2]
        z = chain_pack(z)
        fmap = []
        z, J = WNConv2d(
            self.filters,
            self.kernel_size,
            padding=_get_2d_padding(self.kernel_size),
            use_weight_norm=False,
            name="convs_0",
        )(z, chain_w=J)
        z = nn.leaky_relu(z, 0.2)
        fmap.append((z, z.shape[2] * CHAIN_P / J))
        for i, dilation in enumerate(self.dilations):
            out_chs = min(
                (self.filters_scale ** (i + 1)) * self.filters, self.max_filters
            )
            z, J = WNConv2d(
                out_chs,
                self.kernel_size,
                strides=self.stride,
                dilation=(dilation, 1),
                padding=_get_2d_padding(self.kernel_size, (dilation, 1)),
                name=f"convs_{i + 1}",
            )(z, chain_w=J)
            z = nn.leaky_relu(z, 0.2)
            fmap.append((z, z.shape[2] * CHAIN_P / J))
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        k0 = self.kernel_size[0]
        z, J = WNConv2d(
            out_chs,
            (k0, k0),
            padding=_get_2d_padding((k0, k0)),
            name=f"convs_{len(self.dilations) + 1}",
        )(z, chain_w=J)
        z = nn.leaky_relu(z, 0.2)
        fmap.append((z, z.shape[2] * CHAIN_P / J))
        z, J = WNConv2d(
            self.out_channels,
            (k0, k0),
            padding=_get_2d_padding((k0, k0)),
            name="conv_post",
        )(z, chain_w=J)
        return chain_unpack(z, J), fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    """(msstftd.py:213-269)."""

    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: Sequence[int] = (1024, 2048, 512, 256, 128)
    hop_lengths: Sequence[int] = (256, 512, 128, 64, 32)
    win_lengths: Sequence[int] = (1024, 2048, 512, 256, 128)
    freq_pack: int | str | None = None  # see DiscriminatorSTFT.freq_pack

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) -> (logits list, fmaps list)."""
        logits, fmaps = [], []
        for i in range(len(self.n_ffts)):
            d = DiscriminatorSTFT(
                filters=self.filters,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                n_fft=self.n_ffts[i],
                win_length=self.win_lengths[i],
                hop_length=self.hop_lengths[i],
                freq_pack=self.freq_pack,
                name=f"discriminators_{i}",
            )
            logit, fmap = d(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps

    @property
    def num_discriminators(self):
        return len(self.n_ffts)
