"""DownsampleGRVQ: the quantizer facade around GroupedResidualVQ.

Behavioral twin of reference DownsampleGRVQ
(distilcodec/vector_quantization/grfvq.py:27-146): optional strided-conv
down/upsampling (student config ``downsample_factor=(1,)`` means a kernel-1
stride-1 conv + ConvNeXtBlock — parameters exist but no temporal change,
grfvq.py:68-96), the grouped residual VQ in the middle, and pad/crop of the
output back to the input length (grfvq.py:122-130).

Layout: (B, T, C) channels-last throughout (the reference is (B, C, T)).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from ..config import QuantizerConfig
from ..models.blocks import Conv1d, ConvNeXtBlock, ConvTranspose1d
from .vq import GroupedResidualVQ, GroupedResidualVQOut


@flax.struct.dataclass
class GRVQResult:
    """Mirrors the reference GRVQResult dataclass (grfvq.py:13-24)."""

    quantized: jnp.ndarray  # (B, T, C) — upsampled + pad/cropped
    codes: jnp.ndarray  # (G, B, L, R) int32
    total_loss: jnp.ndarray
    commitment_loss: jnp.ndarray
    codebook_diversity_loss: jnp.ndarray
    quantized_fup: jnp.ndarray  # (B, L, G*codebook_dim) pre-project_out sum
    x_pjt_in: jnp.ndarray  # (B, L, G*codebook_dim) projected input


class DownsampleGRVQ(nn.Module):
    cfg: QuantizerConfig
    dtype: jnp.dtype | None = None  # bf16 compute mode (VQ core stays fp32)
    # per-instance VQ nearest-neighbor mode (None -> DISTILCODEC_VQ_PRECISION
    # env fallback); see quantization.vq.vq_search_mode
    search_mode: str | None = None

    def setup(self):
        cfg = self.cfg
        factors = cfg.downsample_factor
        ds_dims = cfg.downsample_dims or tuple(
            cfg.input_dim for _ in factors
        )
        all_dims = (cfg.input_dim,) + tuple(ds_dims)
        self._all_dims = all_dims

        self.downsample = [
            (
                Conv1d(
                    all_dims[i + 1],
                    kernel_size=f,
                    stride=f,
                    dtype=self.dtype,
                    name=f"downsample_{i}_conv",
                ),
                ConvNeXtBlock(
                    dim=all_dims[i + 1],
                    dtype=self.dtype,
                    name=f"downsample_{i}_block",
                ),
            )
            for i, f in enumerate(factors)
        ]
        rev = list(reversed(list(enumerate(factors))))
        self.upsample = [
            (
                ConvTranspose1d(
                    all_dims[i],
                    kernel_size=f,
                    stride=f,
                    dtype=self.dtype,
                    name=f"upsample_{i}_conv",
                ),
                ConvNeXtBlock(
                    dim=all_dims[i], dtype=self.dtype, name=f"upsample_{i}_block"
                ),
            )
            for i, f in rev
        ]

        self.grvq = GroupedResidualVQ(
            dim=all_dims[-1],
            groups=cfg.n_groups,
            num_quantizers=cfg.n_codebooks,
            codebook_size=cfg.codebook_size,
            codebook_dim=(cfg.codebook_dim if cfg.codebook_dim else None),
            decay=cfg.ema_decay,
            commitment_weight=cfg.commitment_weight,
            codebook_diversity_loss_weight=cfg.codebook_diversity_loss_weight,
            codebook_diversity_temperature=cfg.codebook_diversity_temperature,
            threshold_ema_dead_code=cfg.threshold_ema_dead_code,
            dtype=self.dtype,
            vq_kwargs=(
                {"search_mode": self.search_mode} if self.search_mode else None
            ),
            name="grvq",
        )

    def _down(self, x: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        for conv, block in self.downsample:
            x = conv(x)
            x = block(x, training=training)
        return x

    def _up(self, x: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        for conv, block in self.upsample:
            x = conv(x)
            x = block(x, training=training)
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        training: bool = False,
        update_ema: bool = True,
        freeze_codebook: bool = False,
    ) -> GRVQResult:
        """x: (B, T, input_dim) encoded features -> GRVQResult."""
        orig_t = x.shape[1]
        ds = self._down(x, training=training)
        out: GroupedResidualVQOut = self.grvq(
            ds,
            training=training,
            update_ema=update_ema,
            freeze_codebook=freeze_codebook,
        )
        up = self._up(out.quantized, training=training)

        # pad or crop back to the input length (grfvq.py:122-130)
        diff = orig_t - up.shape[1]
        left = diff // 2
        right = diff - left
        if diff > 0:
            up = jnp.pad(up, ((0, 0), (left, right), (0, 0)))
        elif diff < 0:
            up = up[:, left : up.shape[1] + diff - left]

        return GRVQResult(
            quantized=up,
            codes=out.indices,
            total_loss=out.loss,
            commitment_loss=out.commit_loss,
            codebook_diversity_loss=out.diversity_loss,
            quantized_fup=out.quantized_out,
            x_pjt_in=out.x_pjt_in,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C) -> indices (B, G*R, L), the reference's
        'g b l r -> b (g r) l' layout (grfvq.py:134-139)."""
        ds = self._down(x)
        out = self.grvq(ds)
        g, b, l, r = out.indices.shape
        # (G, B, L, R) -> (B, G, R, L) -> (B, G*R, L)
        ind = jnp.transpose(out.indices, (1, 0, 3, 2))
        return ind.reshape(b, g * r, l)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices (G, B, L, R) -> reconstructed features (B, T, input_dim).

        Matches reference ``DownsampleGRVQ.decode`` (grfvq.py:141-146), which
        takes indices already in 'g b l r' layout.
        """
        z = self.grvq.get_output_from_indices(indices)
        return self._up(z)

    @property
    def codebooks(self) -> jnp.ndarray:
        return self.grvq.codebooks
