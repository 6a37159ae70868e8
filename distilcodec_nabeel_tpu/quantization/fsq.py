"""FSQ (finite scalar quantization) variant.

The reference carries a ``DownsampleGRFSQ`` alternative quantizer
(distilcodec/vector_quantization/grfsq.py:19-123) delegating to the pip
``vector_quantize_pytorch`` GroupedResidualFSQ; its ``levels [8,5,5,5]``
config stub exists in model_config.json:92-97 but ``quantizer_type`` is
'grvq' so it is never instantiated (distil_codec.py:49-53).  We implement FSQ
natively (no pip dependency): per-dimension bounded tanh + round with a
straight-through estimator, mixed-radix code packing, residual and grouped
wrappers, and the same down/upsample scaffold as GRVQ.

FSQ needs no codebook state, no EMA, and no auxiliary losses — it is fully
deterministic given the projection weights.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantizerConfig
from ..models.blocks import Conv1d, ConvNeXtBlock, ConvTranspose1d


def _levels_np(levels: Sequence[int]) -> np.ndarray:
    return np.asarray(levels, dtype=np.int32)


def fsq_bound(z: jnp.ndarray, levels: Sequence[int], eps: float = 1e-3) -> jnp.ndarray:
    """Bound each channel into its level range (lucidrains FSQ convention)."""
    lv = jnp.asarray(_levels_np(levels), jnp.float32)
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """Round-with-straight-through, normalized to [-1, 1] per channel."""
    lv = jnp.asarray(_levels_np(levels), jnp.float32)
    bounded = fsq_bound(z, levels)
    quantized = bounded + jax.lax.stop_gradient(jnp.round(bounded) - bounded)
    half_width = lv // 2
    return quantized / half_width


def fsq_codes_from_quantized(q: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """Normalized quantized values -> mixed-radix integer codes."""
    lv = _levels_np(levels)
    half_width = lv // 2
    digits = jnp.round(q * half_width + half_width).astype(jnp.int32)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    return jnp.sum(digits * basis, axis=-1).astype(jnp.int32)


def fsq_quantized_from_codes(codes: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """Integer codes -> normalized quantized values (..., len(levels))."""
    lv = _levels_np(levels)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    digits = (codes[..., None] // basis) % lv
    half_width = lv // 2
    return (digits - half_width) / half_width


@flax.struct.dataclass
class FSQResult:
    """Mirrors reference FSQResult (grfsq.py:12-16)."""

    quantized: jnp.ndarray  # (B, T, C)
    codes: jnp.ndarray  # (B, G*R, L)
    latents: jnp.ndarray  # (B, L, C) pre-quantization downsampled features


class FSQ(nn.Module):
    """Single FSQ layer: project dim -> len(levels), quantize, project back."""

    dim: int
    levels: Sequence[int]
    dtype: jnp.dtype | None = None

    def setup(self):
        self.project_in = nn.Dense(
            len(self.levels), dtype=self.dtype, name="project_in"
        )
        self.project_out = nn.Dense(self.dim, dtype=self.dtype, name="project_out")

    def __call__(self, x: jnp.ndarray):
        z = self.project_in(x)
        q = fsq_quantize(z.astype(jnp.float32), self.levels)
        codes = fsq_codes_from_quantized(q, self.levels)
        out = self.project_out(q.astype(x.dtype))
        return out, codes

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        q = fsq_quantized_from_codes(codes, self.levels)
        return self.project_out(q.astype(jnp.float32))


class ResidualFSQ(nn.Module):
    """R-layer residual FSQ over one group."""

    dim: int
    levels: Sequence[int]
    num_quantizers: int
    dtype: jnp.dtype | None = None

    def setup(self):
        self.layers = [
            FSQ(self.dim, self.levels, dtype=self.dtype, name=f"layers_{r}")
            for r in range(self.num_quantizers)
        ]
        # per-layer residual scales (lucidrains ResidualFSQ uses levels-based
        # scaling; we keep unit scales — simpler, invertible, and the variant
        # is config-dormant in the reference anyway)

    def __call__(self, x: jnp.ndarray):
        residual = x
        out = jnp.zeros_like(x)
        codes = []
        for layer in self.layers:
            q, c = layer(residual)
            residual = residual - jax.lax.stop_gradient(q)
            out = out + q
            codes.append(c)
        return out, jnp.stack(codes, axis=-1)  # (B,T,dim), (B,T,R)

    def get_output_from_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        out = None
        for r, layer in enumerate(self.layers):
            vec = layer.decode(indices[..., r])
            out = vec if out is None else out + vec
        return out


class GroupedResidualFSQ(nn.Module):
    dim: int
    groups: int
    levels: Sequence[int]
    num_quantizers: int
    dtype: jnp.dtype | None = None

    def setup(self):
        assert self.dim % self.groups == 0
        self.rvqs = [
            ResidualFSQ(
                self.dim // self.groups,
                self.levels,
                self.num_quantizers,
                dtype=self.dtype,
                name=f"rvqs_{g}",
            )
            for g in range(self.groups)
        ]

    def __call__(self, x: jnp.ndarray):
        chunks = jnp.split(x, self.groups, axis=-1)
        outs, codes = [], []
        for rvq, c in zip(self.rvqs, chunks):
            o, ind = rvq(c)
            outs.append(o)
            codes.append(ind)
        return jnp.concatenate(outs, axis=-1), jnp.stack(codes, axis=0)

    def get_output_from_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        outs = [
            rvq.get_output_from_indices(indices[g])
            for g, rvq in enumerate(self.rvqs)
        ]
        return jnp.concatenate(outs, axis=-1)


class DownsampleGRFSQ(nn.Module):
    """FSQ analog of DownsampleGRVQ — same scaffold, same API
    (reference: grfsq.py:19-123)."""

    cfg: QuantizerConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        cfg = self.cfg
        factors = cfg.downsample_factor
        ds_dims = cfg.downsample_dims or tuple(cfg.input_dim for _ in factors)
        all_dims = (cfg.input_dim,) + tuple(ds_dims)
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
                    dim=all_dims[i + 1], dtype=self.dtype, name=f"downsample_{i}_block"
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
        self.residual_fsq = GroupedResidualFSQ(
            dim=all_dims[-1],
            groups=cfg.n_groups,
            levels=cfg.levels,
            num_quantizers=cfg.n_codebooks,
            dtype=self.dtype,
            name="residual_fsq",
        )

    def _down(self, x):
        for conv, block in self.downsample:
            x = conv(x)
            x = block(x)
        return x

    def _up(self, x):
        for conv, block in self.upsample:
            x = conv(x)
            x = block(x)
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        training: bool = False,
        update_ema: bool = False,
        freeze_codebook: bool = False,
    ) -> FSQResult:
        # training/EMA flags accepted for GRVQ interface compatibility;
        # FSQ is stateless (no codebook, no EMA)
        orig_t = x.shape[1]
        z = self._down(x)
        quantized, indices = self.residual_fsq(z)  # (B,L,C), (G,B,L,R)
        up = self._up(quantized)
        diff = orig_t - up.shape[1]
        left = diff // 2
        right = diff - left
        if diff > 0:
            up = jnp.pad(up, ((0, 0), (left, right), (0, 0)))
        elif diff < 0:
            up = up[:, left : up.shape[1] + diff - left]
        g, b, l, r = indices.shape
        codes = jnp.transpose(indices, (1, 0, 3, 2)).reshape(b, g * r, l)
        return FSQResult(quantized=up, codes=codes, latents=z)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        z = self._down(x)
        _, indices = self.residual_fsq(z)
        g, b, l, r = indices.shape
        return jnp.transpose(indices, (1, 0, 3, 2)).reshape(b, g * r, l)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices (B, G*R, L) — the reference grfsq decode layout
        (grfsq.py:112-116 rearranges 'b (g r) l -> g b l r')."""
        b, gr, l = indices.shape
        g = self.cfg.n_groups
        r = gr // g
        ind = jnp.transpose(indices.reshape(b, g, r, l), (1, 0, 3, 2))
        z = self.residual_fsq.get_output_from_indices(ind)
        return self._up(z)
