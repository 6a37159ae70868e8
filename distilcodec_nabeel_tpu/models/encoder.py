"""ConvNeXt-V2 encoder.

Behavioral twin of the reference encoder (distilcodec/models/encoders.py:7-76):
mel (B, T, 128) -> latent (B, T, 1024); stem conv k=7 + LN, 4 stages of depths
(3,3,9,3) at dims (256,512,768,1024) joined by LN + 1x1-conv expanders (stride
1 — no temporal downsampling), stochastic depth up to drop_path_rate, final LN.

Layout note: we run channels-last throughout, so the reference's
"channels_first" LayerNorms become ordinary last-axis LayerNorms and no
permutes exist anywhere in the stack.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from .blocks import Conv1d, ConvNeXtBlock, LayerNorm


class ConvNeXtEncoder(nn.Module):
    cfg: EncoderConfig
    dtype: jnp.dtype | None = None  # bf16 compute mode (params stay fp32)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        """mel: (B, T, input_channels) -> (B, T, dims[-1])."""
        cfg = self.cfg
        depths, dims = cfg.depths, cfg.dims
        assert len(depths) == len(dims)
        # same schedule as torch.linspace over total depth (encoders.py:42)
        dp_rates = np.linspace(0.0, cfg.drop_path_rate, sum(depths))

        x = mel if self.dtype is None else mel.astype(self.dtype)
        cur = 0
        for i in range(len(depths)):
            if i == 0:
                x = Conv1d(
                    dims[0],
                    cfg.kernel_size,
                    padding=cfg.kernel_size // 2,
                    dtype=self.dtype,
                    name="stem_conv",
                )(x)
                x = LayerNorm(name="stem_norm")(x)
            else:
                x = LayerNorm(name=f"expand_norm_{i}")(x)
                x = Conv1d(dims[i], 1, dtype=self.dtype, name=f"expand_conv_{i}")(x)
            for j in range(depths[i]):
                x = ConvNeXtBlock(
                    dim=dims[i],
                    drop_path_rate=float(dp_rates[cur + j]),
                    layer_scale_init_value=cfg.layer_scale_init_value,
                    kernel_size=cfg.kernel_size,
                    dtype=self.dtype,
                    name=f"stage_{i}_block_{j}",
                )(x, training=training)
            cur += depths[i]

        return LayerNorm(name="final_norm")(x)
