"""HiFiGAN-style decoder (generator).

Behavioral twin of the reference generator (distilcodec/models/generators.py:
28-155): quantized latent (B, T, 1024) -> waveform (B, 256*T).  Weight-normed
conv_pre k=13 -> 5 x [SiLU -> ConvTranspose1d upsample (rates 8,4,2,2,2,
kernels 16,12,4,4,4, channels halving 1024->32) -> ParallelBlock(mean of 3
ResBlock1, kernels 3/7/11, dilations (1,3,5))] -> SiLU -> conv_post k=13 ->
tanh.  ``use_template`` noise convs are supported but off in all reference
configs (model_config.json:74).

Training wraps each ParallelBlock in jax.checkpoint (rematerialization), the
TPU analog of the reference's torch.utils.checkpoint on resblocks
(generators.py:132-137).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import DecoderConfig
from .blocks import Conv1d, ConvTranspose1d, ParallelBlock, get_padding


class HiFiGANGenerator(nn.Module):
    cfg: DecoderConfig
    dtype: jnp.dtype | None = None  # bf16 compute mode (params stay fp32)
    # rematerialize ParallelBlocks when training=True (the reference's
    # torch.utils.checkpoint on resblocks, generators.py:132-137).  remat is
    # numerics-neutral (same ops re-executed), so False is bit-identical and
    # skips the recomputed resblock forwards in the backward pass.  Besides
    # True (all stages) / False (none), a comma-separated stage list ("4" =
    # only the final C=32 stage) remats a subset — the late stages hold the
    # LONGEST activations (T doubles per stage), so rematting only them buys
    # most of the memory at a fraction of the recompute (the b19 x 72000
    # fit, BASELINE.md).
    remat: bool | str = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        template: jnp.ndarray | None = None,
        *,
        training: bool = False,
    ) -> jnp.ndarray:
        """x: (B, T, num_mels) -> waveform (B, hop_length*T)."""
        cfg = self.cfg
        if self.dtype is not None:
            x = x.astype(self.dtype)
        rates = cfg.upsample_rates
        kernels = cfg.upsample_kernel_sizes
        init_ch = cfg.upsample_initial_channel
        assert _prod(rates) == cfg.hop_length

        x = Conv1d(
            init_ch,
            cfg.pre_conv_kernel_size,
            padding=get_padding(cfg.pre_conv_kernel_size),
            use_weight_norm=True,
            dtype=self.dtype,
            name="conv_pre",
        )(x)

        for i, (u, k) in enumerate(zip(rates, kernels)):
            ch = init_ch // (2 ** (i + 1))
            x = nn.silu(x)
            x = ConvTranspose1d(
                ch,
                k,
                stride=u,
                padding=(k - u) // 2,
                use_weight_norm=True,
                dtype=self.dtype,
                pack_maxc=None if training else 64,
                name=f"ups_{i}",
            )(x)
            if cfg.use_template and template is not None:
                if i + 1 < len(rates):
                    stride_f0 = _prod(rates[i + 1 :])
                    noise = Conv1d(
                        ch,
                        stride_f0 * 2,
                        stride=stride_f0,
                        padding=stride_f0 // 2,
                        name=f"noise_convs_{i}",
                    )(template)
                else:
                    noise = Conv1d(ch, 1, name=f"noise_convs_{i}")(template)
                x = x + noise
            block = ParallelBlock(
                ch,
                cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes,
                dtype=self.dtype,
                # inference packs the C=64 stage too (633.8 -> 643.2
                # au-s/s round trip); training keeps the default cutoff so
                # the train-step program is unchanged (blocks._resblock_pack)
                pack_maxc=None if training else 64,
                # inference-only whole-stage Pallas fusion of the C<=128
                # stages — opt-in via DISTILCODEC_FUSED_STAGE=1 (r4 measured
                # negative at flagship shapes; ops/fused_stage.py)
                fused_stage=not training,
                name=f"resblocks_{i}",
            )
            if training and _remat_stage(self.remat, i):
                x = nn.remat(lambda mdl, y: mdl(y))(block, x)
            else:
                x = block(x)

        x = nn.silu(x)
        # conv_post has ONE output channel — packed it emits f samples/frame
        # (8.2 ms -> ~2 ms at the flagship shape; blocks._resblock_pack)
        from .blocks import _resblock_pack

        B, T, C = x.shape
        f = _resblock_pack(C, T)
        if f > 1:
            x = x.reshape(B, T // f, f * C)
        x = Conv1d(
            1,
            cfg.post_conv_kernel_size,
            padding=get_padding(cfg.post_conv_kernel_size),
            use_weight_norm=True,
            dtype=self.dtype,
            pack=f,
            name="conv_post",
        )(x)
        if f > 1:
            x = x.reshape(B, T, 1)
        # waveform always returned fp32 (bf16 mantissa is audible)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def _prod(xs) -> int:
    out = 1
    for v in xs:
        out *= v
    return out


def _remat_stage(remat: bool | str, i: int) -> bool:
    """Whether stage ``i``'s ParallelBlock is rematerialized (see
    HiFiGANGenerator.remat)."""
    if isinstance(remat, bool):
        return remat
    return i in {int(s) for s in str(remat).split(",") if s.strip()}
