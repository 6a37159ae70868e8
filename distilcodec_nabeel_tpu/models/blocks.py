"""Shared neural blocks, TPU-first.

Everything runs in channels-last ``(B, T, C)`` layout: C ∈ {128, 256, ...,
1024} maps onto the 128-wide TPU lane dimension, so LayerNorm/MLP/conv all tile
cleanly onto the VPU/MXU without relayouts.  (The reference is channels-first
torch, distilcodec/models/convnext_utils.py — behavior is matched, layout is
not.)

Weight normalization is stored explicitly as (g, v) parameter pairs computing
``w = g * v / ||v||`` (the decomposition torch's ``weight_norm`` uses,
reference: distilcodec/models/generators.py:50, convnext_utils.py:36), so
reference checkpoints map 1:1 and ``fold_weight_norm`` can strip it for
inference.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)
_normal001 = nn.initializers.normal(stddev=0.01)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels (reference: convnext_utils.py:26-27)."""
    return (kernel_size * dilation - dilation) // 2


def fold_weight_norm(params, _path=()):
    """Fold (g, v) weight-norm pairs into plain weights — the functional
    analog of the reference's ``remove_weight_norm`` inference export
    (generators.py:149-155, convnext_utils.py:105-110).

    Every ``{v, g}`` leaf dict is rewritten so that ``v`` holds the folded
    weight ``w = g·v/||v||`` and ``g = ||w||`` — the module's normalization
    then reproduces ``w`` exactly (and the fold is idempotent), so no module
    reconfiguration is needed and the checkpoint becomes plain weights.

    Normalization axes per layer kind (matching torch ``weight_norm(dim=0)``
    over each layout): rank-4 Conv2d (kh, kw, in, out) and dense Conv1d
    (k, in, out) -> g per *output* channel; ConvTranspose1d (k, in, out) -> g
    per *input* channel.  Transposed layers are identified by module name
    (generator ``ups_*``; quantizer upsample convs are not weight-normed).
    """
    if not isinstance(params, dict):
        return params
    if "v" in params and "g" in params:
        v, g = params["v"], params["g"]
        name = _path[-1] if _path else ""
        is_transpose = name.startswith("ups_") or (
            name.startswith("upsample") and name.endswith("conv")
        )
        if v.ndim == 4:
            axes, bcast = (0, 1, 2), (1, 1, 1, -1)
        elif is_transpose:
            assert g.shape[0] == v.shape[1], (_path, v.shape, g.shape)
            axes, bcast = (0, 2), (1, -1, 1)
        else:
            assert g.shape[0] == v.shape[2], (_path, v.shape, g.shape)
            axes, bcast = (0, 1), (1, 1, -1)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        w = v * (g.reshape(bcast) / norm)
        new_g = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes))
        return {**params, "v": w, "g": new_g}
    return {k: fold_weight_norm(val, _path + (k,)) for k, val in params.items()}


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with eps=1e-6.

    Covers both of the reference's data formats (convnext_utils.py:186-213):
    in channels-last layout, "channels_first" LN over dim 1 and F.layer_norm
    over the last dim are the same computation.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


def drop_path(
    x: jnp.ndarray, rate: float, rng: jax.Array, scale_by_keep: bool = True
) -> jnp.ndarray:
    """Stochastic depth per sample (reference: convnext_utils.py:146-168)."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if scale_by_keep:
        mask = mask / keep
    return x * mask


class Conv1d(nn.Module):
    """1-D convolution over (B, T, C_in) -> (B, T', C_out), torch semantics.

    ``padding`` is symmetric sample-count padding like torch Conv1d.
    Optional weight norm stores params (v, g) with g per output channel
    (torch weight_norm dim=0 over an (out, in, k) tensor).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = _trunc02
    dtype: jnp.dtype | None = None
    # >1: input/output are time-packed (B, S, pack*C) — see
    # ops.conv1d.conv1d_packed_frames.  Param shapes/names are unchanged.
    pack: int = 1
    # non-depthwise grouped-conv lowering for THIS instance
    # ('grouped'|'dense'|'dense128'|'dense_gw'); None falls back to the
    # DISTILCODEC_GROUPED_CONV env var (ops.conv1d.grouped_lowering)
    grouped_conv_lowering: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1] // self.pack
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.use_weight_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            g = self.param(
                "g",
                lambda _key, _shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))),
                (self.features,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
            kernel = v * (g[None, None, :] / norm)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        dtype = self.dtype or x.dtype
        # In reduced precision, emit the conv result directly in that dtype
        # and add the bias there: a dangling fp32 conv output + fp32 bias add
        # materializes full-size fp32 buffers (measured 209 ms vs 64 ms for
        # the C=32 HiFiGAN stage).  MXU accumulation is fp32 either way; the
        # only numerics change in bf16 mode is one extra rounding before the
        # bias add.  fp32 mode is bit-identical to before.
        pref = jnp.float32 if dtype == jnp.float32 else dtype

        if self.pack > 1:
            from ..ops.conv1d import conv1d_packed_frames

            assert self.stride == 1 and self.groups == 1
            y = conv1d_packed_frames(
                x.astype(dtype),
                kernel.astype(dtype),
                pack=self.pack,
                padding=self.padding,
                dilation=self.dilation,
                preferred_element_type=pref,
            )
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                y = y + jnp.tile(b, self.pack).astype(y.dtype)
            return y.astype(dtype)

        strategy = _conv_lowering()
        is_depthwise = self.groups == in_ch and self.features == in_ch
        groups = self.groups
        if groups > 1 and not is_depthwise:
            from ..ops.conv1d import (
                dense_grouped_conv,
                grouped_lowering,
                grouped_to_dense_kernel,
                grouped_to_tile_grouped_kernel,
            )

            low = self.grouped_conv_lowering or grouped_lowering()
            if low == "dense128":
                # normalize low after regrouping (mirrors SNConv1d) so the
                # branches below read identically in both implementations
                if in_ch % 128 == 0 and groups % (in_ch // 128) == 0:
                    kernel, groups = grouped_to_tile_grouped_kernel(
                        kernel, groups
                    )
                    low = "grouped"  # proceed with the regrouped conv
                else:  # structure doesn't embed in 128-tiles: plain dense
                    low = "dense"
            if low == "dense_gw":
                y = dense_grouped_conv(
                    x.astype(dtype),
                    kernel.astype(dtype),
                    groups,
                    self.stride,
                    self.padding,
                    self.dilation,
                    pref,
                )
                if self.use_bias:
                    b = self.param(
                        "bias", nn.initializers.zeros, (self.features,), jnp.float32
                    )
                    y = y + b.astype(y.dtype)
                return y.astype(dtype)
            if low == "dense":
                kernel = grouped_to_dense_kernel(kernel, groups)
                groups = 1
        use_mm = strategy == "mm" or (strategy == "auto" and is_depthwise)
        # space-to-depth packing for small-channel dense convs (MXU lane fill)
        import os as _os

        if (
            _os.environ.get("DISTILCODEC_PACK_SMALL_CH") == "1"
            and strategy == "auto"
            and not is_depthwise
            and self.groups == 1
            and self.stride == 1
            and in_ch < 128
            and 128 % in_ch == 0
            and x.shape[1] % (128 // in_ch) == 0
        ):
            from ..ops.conv1d import conv1d_packed

            y = conv1d_packed(
                x.astype(dtype),
                kernel.astype(dtype),
                padding=self.padding,
                dilation=self.dilation,
                pack=128 // in_ch,
            )
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                y = (y.astype(jnp.float32) + b).astype(dtype)
            return y.astype(dtype)
        if use_mm:
            from ..ops.conv1d import conv1d_mm

            y = conv1d_mm(
                x.astype(dtype),
                kernel.astype(dtype),
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=groups,
            )
        else:
            from ..ops.conv1d import (
                grouped_conv_s1_directdx,
                grouped_custom_bwd_enabled,
            )

            if (
                groups > 1
                and self.stride == 1
                and grouped_custom_bwd_enabled()
                and (self.kernel_size - 1) * self.dilation >= self.padding
            ):
                # opt-in direct input-gradient lowering (probe_dx.py: 2.6x
                # on the stride-1 fgc=8 MSD layer; value/grad-exact)
                y = grouped_conv_s1_directdx(
                    x.astype(dtype),
                    kernel.astype(dtype),
                    groups,
                    self.padding,
                    self.dilation,
                    jnp.dtype(pref).name,
                )
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(dtype),
                    kernel.astype(dtype),
                    window_strides=(self.stride,),
                    padding=[(self.padding, self.padding)],
                    rhs_dilation=(self.dilation,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    feature_group_count=groups,
                    preferred_element_type=pref,
                )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y.astype(dtype)


def _resblock_pack(channels: int, length: int, maxc: int | None = None) -> int:
    """Time-packing factor for small-channel residual stacks.

    C=32 on a 128-lane MXU runs at 2-5 TFLOP/s; packing 4 samples into the
    channel dim reaches ~28 ms vs 209 ms for the flagship final HiFiGAN
    stage (v5e, B=16, L=240128).  C>=64 measured faster unpacked (the
    packed kernel's structural zeros outgrow the lane-fill win), so packing
    applies below that by default.  ``maxc`` (or the
    ``DISTILCODEC_PACK_RESBLOCKS_MAXC`` env fallback) raises the channel
    cutoff: the INFERENCE decode passes 64 — packing the C=64 stage at f=2
    measured 633.8 -> 643.2 au-s/s/chip on the full round trip (r3; the r2
    per-stage decode measurement was a wash, the end-to-end one is not).
    Training keeps the default so the train-step program (and its compile
    cache) is unchanged.  ``DISTILCODEC_PACK_RESBLOCKS=0`` disables."""
    import os

    if os.environ.get("DISTILCODEC_PACK_RESBLOCKS", "1") == "0":
        return 1
    if maxc is None:
        maxc = int(
            os.environ.get("DISTILCODEC_PACK_RESBLOCKS_MAXC", "63") or 63
        )
    if channels > maxc or channels <= 0 or 128 % channels:
        return 1
    if channels >= 64 and 0 < length < 32768:
        # the C=64 f=2 packing wins at batch-decode lengths (T≈120k:
        # 633.8 -> 643.6 au-s/s) but LOSES on small streaming chunks
        # (T≈4k: decode 35.4 -> 42.0 ms/chunk — the relayouts outweigh the
        # lane fill at tiny T), so it is length-gated (r3 measurements)
        return 1
    f = min(128 // channels, 8)
    while f > 1 and length % f:
        f //= 2
    return f


def _conv_lowering() -> str:
    """Conv lowering strategy, resolved at trace time.

    'auto' (default): shift-FMA lowering for depthwise convs, XLA native conv
    for dense/grouped ones.  Measured end-to-end on v5e (composed bf16 decode
    of 80 audio-s): all-lax 200 ms, all-mm 515 ms — the unrolled tap-matmuls
    re-read large activations per tap while XLA's dense-conv lowering tiles
    with VMEM reuse; depthwise convs are bandwidth-bound shifts where the FMA
    form wins.  'lax' / 'mm' force one strategy everywhere.
    """
    import os

    return os.environ.get("DISTILCODEC_CONV_LOWERING", "auto")


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution with torch ConvTranspose1d semantics:
    ``out_len = (L-1)*stride - 2*padding + kernel_size``.

    Lowered as an input-dilated conv (lhs_dilation=stride) — XLA's native
    lowering path on TPU.  The kernel parameter ``v`` is stored pre-flipped in
    conv layout (k, in, out); weight-norm ``g`` is per *input* channel, the
    axis torch's weight_norm(dim=0) normalizes for an (in, out, k) transposed
    conv weight (reference: generators.py:69-79).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = _trunc02
    dtype: jnp.dtype | None = None
    # packed-output channel cutoff override (see _resblock_pack)
    pack_maxc: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        if self.use_weight_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            g = self.param(
                "g",
                lambda _key, _shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))),
                (in_ch,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
            kernel = v * (g[None, :, None] / norm)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        dtype = self.dtype or x.dtype
        # small-C_out upsamples underfill MXU lanes; emit f_out packed output
        # samples per frame instead (ops.conv1d.conv_transpose1d_packed)
        f_out = _resblock_pack(
            self.features, x.shape[1] * self.stride, self.pack_maxc
        )
        while f_out > 1 and (
            f_out % self.stride or x.shape[1] % (f_out // self.stride)
        ):
            f_out //= 2
        if f_out > 1 and _conv_lowering() == "auto":
            from ..ops.conv1d import conv_transpose1d_packed

            y = conv_transpose1d_packed(
                x.astype(dtype),
                kernel.astype(dtype),
                stride=self.stride,
                padding=self.padding,
                f_out=f_out,
            )
        elif _conv_lowering() == "mm":
            from ..ops.conv1d import conv_transpose1d_mm

            y = conv_transpose1d_mm(
                x.astype(dtype),
                kernel.astype(dtype),
                stride=self.stride,
                padding=self.padding,
            )
        else:
            pad = self.kernel_size - 1 - self.padding
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                # same epilogue policy as Conv1d: reduced-precision output +
                # bias in that dtype avoids materializing fp32 buffers
                preferred_element_type=(
                    jnp.float32 if dtype == jnp.float32 else dtype
                ),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y.astype(dtype)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block (reference: convnext_utils.py:217-282).

    depthwise conv(k) -> LN -> Linear(4x) -> GELU(exact) -> Linear -> layer
    scale gamma -> drop path -> residual.  All in (B, T, C).
    """

    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    mlp_ratio: float = 4.0
    kernel_size: int = 7
    dilation: int = 1
    dtype: jnp.dtype | None = None
    # None -> DISTILCODEC_GELU_APPROX env (default off).  True swaps the
    # exact-erf GELU for the tanh approximation: erf is the one activation
    # the TPU VPU has no fast path for (0.87 ms standalone on the
    # (16,938,4096) MLP activation vs ~free for tanh/sigmoid/silu,
    # probe_gelu.py), so the exact form costs ~1 ms/block at C=1024.
    # CHANGES NUMERICS (reference = torch's exact erf GELU): opt-in
    # serving recipe only; the measured token-flip bound on real audio is
    # recorded in DESIGN.md before use.
    gelu_approx: bool | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, training: bool = False, apply_residual: bool = True
    ) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        inputs = x
        x = Conv1d(
            self.dim,
            self.kernel_size,
            padding=int(self.dilation * (self.kernel_size - 1) / 2),
            dilation=self.dilation,
            groups=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = LayerNorm(name="norm")(x)
        x = nn.Dense(
            int(self.mlp_ratio * self.dim),
            kernel_init=_trunc02,
            dtype=self.dtype,
            name="pwconv1",
        )(x)
        approx = self.gelu_approx
        if approx is None:
            import os

            # TRACE-TIME read: already-jitted programs keep whatever value
            # was in effect when they were traced — flipping the env var
            # mid-process requires jax.clear_caches() (or a fresh process).
            # Prefer the module attribute / config plumbing for in-process
            # switching (advisor r4).
            approx = bool(int(os.environ.get("DISTILCODEC_GELU_APPROX", "0") or 0))
        x = nn.gelu(x, approximate=approx)
        x = nn.Dense(
            self.dim, kernel_init=_trunc02, dtype=self.dtype, name="pwconv2"
        )(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
                jnp.float32,
            )
            x = gamma.astype(x.dtype) * x
        if training and self.drop_path_rate > 0.0:
            x = drop_path(x, self.drop_path_rate, self.make_rng("droppath"))
        if apply_residual:
            x = inputs + x
        return x


class ResBlock1(nn.Module):
    """HiFiGAN residual block, SiLU variant (reference: convnext_utils.py:30-119)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype | None = None
    pack: int = 1  # >1: x is time-packed (B, S, pack*channels) throughout

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = nn.silu(x)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, d),
                dilation=d,
                use_weight_norm=True,
                kernel_init=_normal001,
                dtype=self.dtype,
                pack=self.pack,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.silu(xt)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, 1),
                use_weight_norm=True,
                kernel_init=_normal001,
                dtype=self.dtype,
                pack=self.pack,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ParallelBlock(nn.Module):
    """Mean of parallel ResBlock1s (reference: convnext_utils.py:122-142)."""

    channels: int
    kernel_sizes: Sequence[int] = (3, 7, 11)
    dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dtype: jnp.dtype | None = None
    # time-packing channel cutoff override (None -> 63 / env); the inference
    # decode passes 64 (see _resblock_pack)
    pack_maxc: int | None = None
    # opt-in whole-stage Pallas fusion (ops/fused_stage.py): the 18-conv
    # SiLU/residual stack runs VMEM-resident in one kernel when the packed
    # lane count f*C is exactly 128 and DISTILCODEC_FUSED_STAGE=1.
    # Inference-only (no VJP).  r4 measured NEGATIVE at flagship shapes
    # (fused_stage_enabled docstring) — default env gate is off.
    fused_stage: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, C = x.shape
        f = _resblock_pack(C, T, self.pack_maxc)
        if f > 1:
            # run the whole stack time-packed: one relayout in, one out;
            # every conv sees f*C-lane matmuls (ops.conv1d_packed_frames)
            x = x.reshape(B, T // f, f * C)
        if self.fused_stage and f * C == 128:
            from ..ops.fused_stage import fused_stage_enabled

            if fused_stage_enabled():
                return self._fused(x, f).reshape(B, T, C)
        outs = []
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilation_sizes)):
            outs.append(
                ResBlock1(
                    self.channels,
                    k,
                    tuple(d),
                    dtype=self.dtype,
                    pack=f,
                    name=f"blocks_{i}",
                )(x)
            )
        out = sum(outs) / len(outs)
        return out.reshape(B, T, C) if f > 1 else out

    def _fused(self, x_packed: jnp.ndarray, f: int) -> jnp.ndarray:
        """Whole-stage fused path.  Declares the IDENTICAL parameter tree by
        running the ResBlock1 stack on a tiny dummy (param init in flax is
        path-keyed, so shapes/names/values match the unfused module and
        checkpoints load either way; XLA dead-code-eliminates the dummy
        compute), then hands the folded kernels to the Pallas stage kernel."""
        import os

        from ..ops.fused_stage import (
            build_stage_plan,
            build_tap_arrays,
            fused_parallel_block,
        )

        dummy = jnp.zeros((1, 16, f * self.channels), x_packed.dtype)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilation_sizes)):
            ResBlock1(
                self.channels,
                k,
                tuple(d),
                dtype=self.dtype,
                pack=f,
                name=f"blocks_{i}",
            )(dummy)
        params = self.variables["params"]
        plan = build_stage_plan(
            self.channels,
            f,
            tuple(self.kernel_sizes),
            tuple(tuple(d) for d in self.dilation_sizes),
        )
        taps, biases = build_tap_arrays(plan, params, x_packed.dtype)
        tile_s = int(os.environ.get("DISTILCODEC_FUSED_TILE", "1024"))
        group = int(os.environ.get("DISTILCODEC_FUSED_GROUP", "8"))
        try:
            plat = jax.devices()[0].platform.lower()
        except Exception:
            plat = "cpu"
        return fused_parallel_block(
            x_packed,
            taps,
            biases,
            plan=plan,
            tile_s=tile_s,
            group=group,
            # Mosaic kernels only exist on TPU; a forced CPU run (env "1",
            # tests) goes through the Pallas interpreter
            interpret=plat not in ("tpu", "axon"),
        )
