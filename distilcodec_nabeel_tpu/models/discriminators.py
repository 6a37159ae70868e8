"""MPD + MSD adversarial discriminators.

Behavioral twins of the reference (distilcodec/models/descriminators.py:
128-321): DiscriminatorP reshapes the waveform into (T/p, p) 2-D maps per
period and runs 5 stacked weight-normed (k,1)-kernel stride-(3,1) Conv2ds;
DiscriminatorS runs 7 grouped 1-D convs at scales x1, /2, /4 (AvgPool), first
scale spectrally normalized.

Reference quirk honored: MultiScaleDiscriminator's config branch is inverted
(``if self.msd_config is not None`` selects the *default* architecture and the
config-reading branch dereferences None, descriminators.py:273-282) — so the
torch-default DiscriminatorS stack is what actually trains; we build that by
default.  ``MultiScaleDiscriminator(layers=...)`` overrides the stack (a
framework extension for tests / the multi-chip dryrun, not reference parity).

Spectral norm keeps its power-iteration vector in the ``spectral`` variable
collection — updated in-forward like torch, but as an explicit functional
state transition.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1

_normal001 = nn.initializers.normal(stddev=0.01)


CHAIN_P = 4  # fixed W-block size of the chain-packed lowering


def _chain_route(kw: int, s: int, padw: int, p: int = CHAIN_P, dtype=None):
    """0/1 routing tensor for the chain-packed conv (see WNConv2d docstring).

    Output phase o, tap u reads unpacked position o*s + u - padw relative to
    the output block's origin; with L0 = ceil(padw/p) whole zero blocks of
    left padding the relative packed coordinate rv = o*s + u + (p*L0 - padw)
    is nonnegative, landing in kernel block rv//p at within-block offset
    rv%p.  Returns (route (kw, p, Bk, p), Bk, L0)."""
    import numpy as np

    L0 = -(-padw // p)
    shift = p * L0 - padw
    rmax = (p - 1) * s + (kw - 1) + shift
    Bk = rmax // p + 1
    route = np.zeros((kw, p, Bk, p), dtype or np.float32)
    for o in range(p):
        for u in range(kw):
            rv = o * s + u + shift
            route[u, o, rv // p, rv % p] = 1
    return route, Bk, L0


def chain_pack(z: "jnp.ndarray", p: int = CHAIN_P) -> "jnp.ndarray":
    """(B, H, W, C) -> (B, H, ceil(W/p), p*C), zero tail (r-major layout)."""
    B, H, W, C = z.shape
    Wb = -(-W // p)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, Wb * p - W), (0, 0)))
    return z.reshape(B, H, Wb, p * C)


def chain_unpack(y: "jnp.ndarray", true_w: int, p: int = CHAIN_P) -> "jnp.ndarray":
    """(B, H, Bout, p*C) -> (B, H, true_w, C)."""
    B, H, Bout, pc = y.shape
    c = pc // p
    return y.reshape(B, H, Bout * p, c)[:, :, :true_w]


class WNConv2d(nn.Module):
    """Weight-normed Conv2d over (B, H, W, C), torch padding semantics.

    ``freq_pack=p`` lowers the conv to an EXACT space-to-depth form along W
    (frequency): p consecutive W positions ride in the channel (lane) dim, the
    true (kh, kw, Cin, Cout) kernel is scattered with structural zeros into a
    (kh, Bk, q*Cin, p*Cout) packed kernel (q = p*stride_w), and the output is
    unpacked/cropped back — identical values and gradients.  Why: the MS-STFT
    convs are 32-channel, so in NHWC only 32 of the TPU's 128 lanes carry
    data; XLA pads activation/GRADIENT buffers 4x on the lane dim (measured
    5.1x total tile padding at batch 19x72000, the last OOM offender —
    TODO.md).  Packing p=4 fills the lanes for both the forward and its
    gradient convs.  Requires dilation_w == 1 (true for every MS-STFT conv:
    dilation is time-only, msstftd.py:107-210).

    ``chain_w=J`` (chain-packed mode, r4): the input is ALREADY packed —
    (B, H, Wb, 4*Cin) with true unpacked width J and a zeroed tail — and the
    output stays packed.  Per-conv pack/unpack relayouts are what kept the
    per-conv packed stack at ~5x its bandwidth bound (probe_msstft.py): each
    conv re-materialized the ~100 MB activation twice just to re-block it.
    Here every conv keeps the FIXED block size 4 on both sides; a stride s
    rides as ``window_strides=s`` on the block axis (out block b reads
    blocks b*s ...), the unpacked SAME padding is folded into the kernel
    routing plus whole zero blocks of conv padding, and the zero tail is
    re-established by an epilogue mask (window reads past J see exact
    zeros, like the unpacked zero padding).  Identical values and gradients
    to the plain conv (tests/test_msstftd_chain.py); FLOP inflation
    Bk*4/kw (1.3-1.8x on the (3,9) convs) against relayout-free chaining.
    Returns ``(packed_out, J_out)``.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: tuple = (0, 0)
    dilation: tuple = (1, 1)
    use_weight_norm: bool = True
    freq_pack: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, chain_w: int | None = None):
        in_ch = x.shape[-1] if chain_w is None else x.shape[-1] // CHAIN_P
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)
        v = self.param("v", _normal001, kshape, jnp.float32)
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda _k, _s: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))),
                (self.features,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
            kernel = v * (g / norm)
        else:
            kernel = v
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # compute in the input dtype (params stay fp32): bf16 inputs halve
        # the conv activation/gradient buffers — the dominant training-memory
        # cost (see Trainer.disc_dtype) — and double the MXU rate; fp32
        # accumulation is only forced when the input itself is fp32
        dtype = x.dtype
        pref = jnp.float32 if dtype == jnp.float32 else dtype
        if chain_w is not None:
            assert self.dilation[1] == 1, "chain mode needs dilation_w == 1"
            return self._chain_packed(x, chain_w, kernel.astype(dtype), b, pref)
        if self.freq_pack > 1 and self.dilation[1] == 1:
            return self._freq_packed(
                x, kernel.astype(dtype), b, pref
            )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(dtype),
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref,
        )
        return y + b.astype(y.dtype)

    def _chain_packed(self, x, J_in, kernel, b, pref):
        """Chain-packed conv (see class docstring): x (B, H, Wb, 4*Cin) with
        true width J_in and zero tail -> ((B, H', Bout, 4*cout), J_out)."""
        import numpy as np

        p = CHAIN_P
        kh, kw, cin, cout = kernel.shape
        sh, s = self.strides
        padh, padw = self.padding
        dh = self.dilation[0]
        route, Bk, L0 = _chain_route(kw, s, padw, p, kernel.dtype)
        # HIGHEST for the same reason as _freq_packed (advisor r3): the
        # routing contraction is over weight-sized constants only
        wp = jnp.einsum(
            "kucj,uobr->kbrcoj",
            kernel,
            jnp.asarray(route),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(kh, Bk, p * cin, p * cout)
        J_out = (J_in + 2 * padw - ((kw - 1) + 1)) // s + 1
        Bout = -(-J_out // p)
        Wb = x.shape[2]
        right = max(0, (Bout - 1) * s + Bk - (Wb + L0))
        y = jax.lax.conv_general_dilated(
            x,
            wp,
            window_strides=(sh, s),
            padding=[(padh, padh), (L0, right)],
            rhs_dilation=(dh, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref,
        )[:, :, :Bout]
        # bias per true channel j at packed index o*cout + j, then the
        # zero-tail mask (positions >= J_out) — the invariant every window
        # read past J relies on; XLA fuses both into the conv epilogue
        mask = (np.arange(Bout * p).reshape(Bout, p) < J_out).astype(
            np.float32
        )
        mask = np.repeat(mask, cout, axis=1).reshape(1, 1, Bout, p * cout)
        y = (y + jnp.tile(b, p).astype(y.dtype)) * jnp.asarray(
            mask, y.dtype
        )
        return y, J_out

    def _freq_packed(self, x, kernel, b, pref):
        """Exact W-packed lowering (see class docstring)."""
        p = self.freq_pack
        kh, kw, cin, cout = kernel.shape
        s = self.strides[1]
        q = p * s
        B, H, W, C = x.shape
        pad = self.padding[1]
        J = (W + 2 * pad - kw) // s + 1  # true output width
        Bk = -(-((p - 1) * s + kw) // q)  # packed kernel width (blocks)
        Bout = -(-J // p)  # packed output width (blocks)
        need = (Bout - 1 + Bk) * q  # input width the packed conv reads
        xpad = jnp.pad(
            x, ((0, 0), (0, 0), (pad, max(0, need - W - pad)), (0, 0))
        )[:, :, :need]
        xp = xpad.reshape(B, H, need // q, q * C)
        # route the true taps into the packed kernel (structural zeros
        # elsewhere) with ONE einsum against a constant 0/1 tensor: output
        # phase o reads input position o*s+u for tap u, i.e. block
        # (o*s+u)//q, within-block offset (o*s+u)%q.  A single einsum (and a
        # single einsum gradient) compiles far faster than the equivalent
        # p*kw-scatter chain (the round-2 dryrun compile hog) and lowers to
        # one MXU-friendly contraction.
        import numpy as np

        route = np.zeros((kw, p, Bk, q), kernel.dtype)
        for o in range(p):
            for u in range(kw):
                gi = o * s + u
                route[u, o, gi // q, gi % q] = 1
        # HIGHEST precision: this contracts weight-sized constants only (the
        # routing tensor is 0/1), so the cost is negligible — but at default
        # precision TPU f32 dots round operands to bf16, which would silently
        # break the fp32-mode exactness this packing promises (advisor r3).
        wp = jnp.einsum(
            "kucj,uobr->kbrcoj",
            kernel,
            jnp.asarray(route),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(kh, Bk, q * C, p * cout)
        y = jax.lax.conv_general_dilated(
            xp,
            wp,
            window_strides=(self.strides[0], 1),
            padding=[(self.padding[0], self.padding[0]), (0, 0)],
            rhs_dilation=(self.dilation[0], 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref,
        )  # (B, H', Bout, p*cout)
        y = y.reshape(B, y.shape[1], Bout * p, cout)[:, :, :J]
        return y + b.astype(y.dtype)


class SNConv1d(nn.Module):
    """Spectral-normalized Conv1d (torch spectral_norm semantics: one power
    iteration per training forward on the (out, in*k) matricized weight)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    # grouped-conv lowering override (None -> DISTILCODEC_GROUPED_CONV env)
    grouped_conv_lowering: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_stats: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        w = self.param("kernel", _normal001, kshape, jnp.float32)
        # matricize like torch: (out, in/g * k)
        w2d = jnp.transpose(w, (2, 1, 0)).reshape(self.features, -1)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2norm(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        v_var = self.variable(
            "spectral",
            "v",
            lambda: _l2norm(
                jnp.matmul(jax.lax.stop_gradient(u_var.value), w2d)
            ),
        )
        if update_stats and not self.is_initializing():
            # one torch-style power iteration (training forward)
            u = jax.lax.stop_gradient(u_var.value)
            v = _l2norm(jnp.matmul(u, w2d))
            u = _l2norm(jnp.matmul(w2d, v))
            u_var.value = jax.lax.stop_gradient(u)
            v_var.value = jax.lax.stop_gradient(v)
        u = jax.lax.stop_gradient(u_var.value)
        v = jax.lax.stop_gradient(v_var.value)
        sigma = jnp.dot(u, jnp.matmul(w2d, v))
        kernel = w / sigma
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # spectral-norm math above stays fp32 on the fp32 param; only the
        # conv computes in the input dtype (see WNConv2d note)
        dtype = x.dtype
        pref = jnp.float32 if dtype == jnp.float32 else dtype
        groups = self.groups
        if groups > 1:
            from ..ops.conv1d import (
                dense_grouped_conv,
                grouped_lowering,
                grouped_to_dense_kernel,
                grouped_to_tile_grouped_kernel,
            )

            low = self.grouped_conv_lowering or grouped_lowering()
            if low == "dense128":
                if in_ch % 128 == 0 and groups % (in_ch // 128) == 0:
                    kernel, groups = grouped_to_tile_grouped_kernel(
                        kernel, groups
                    )
                    low = "grouped"  # proceed with the regrouped conv
                else:
                    low = "dense"
            if low == "dense_gw":
                y = dense_grouped_conv(
                    x,
                    kernel.astype(dtype),
                    groups,
                    self.stride,
                    self.padding,
                    1,
                    pref,
                )
                return y + b.astype(y.dtype)
            if low == "dense":
                kernel = grouped_to_dense_kernel(kernel, groups)
                groups = 1
        from ..ops.conv1d import (
            grouped_conv_s1_directdx,
            grouped_custom_bwd_enabled,
        )

        if (
            groups > 1
            and self.stride == 1
            and grouped_custom_bwd_enabled()
            and (self.kernel_size - 1) >= self.padding
        ):
            # opt-in direct input-gradient lowering (see Conv1d / probe_dx.py)
            y = grouped_conv_s1_directdx(
                x,
                kernel.astype(dtype),
                groups,
                self.padding,
                1,
                jnp.dtype(pref).name,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(dtype),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=groups,
                preferred_element_type=pref,
            )
        return y + b.astype(y.dtype)


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class DiscriminatorP(nn.Module):
    """Per-period 2-D discriminator (descriminators.py:128-178)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) waveform -> (logits (B, N), feature maps list)."""
        fmap = []
        b, t = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1)  # (B, H=T/p, W=p, C=1)

        channels = (32, 128, 512, 1024)
        for i, ch in enumerate(channels):
            x = WNConv2d(
                ch,
                (self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=(2, 0),
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv2d(
            1024, (self.kernel_size, 1), strides=(1, 1), padding=(2, 0), name="convs_4"
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), padding=(1, 0), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """(descriminators.py:181-217); periods from model_config
    (5,8,13,19,30) or the torch defaults (2,3,5,7,11)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    kernel_size: int = 5
    stride: int = 3
    # run real+fake as ONE concatenated batch per sub-discriminator instead
    # of two programs: convs are batch-row independent, so results are
    # bit-identical, but the compiler sees half as many ops at twice the
    # batch (better MXU fill + pipelining on the D phase).
    batch_pack: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        B = y.shape[0]
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(
                p, self.kernel_size, self.stride, name=f"discriminators_{i}"
            )
            if self.batch_pack:
                lg, fm = d(jnp.concatenate([y, y_hat], axis=0))
                y_d_r, y_d_g = lg[:B], lg[B:]
                fmap_r = [f[:B] for f in fm]
                fmap_g = [f[B:] for f in fm]
            else:
                y_d_r, fmap_r = d(y)
                y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# The torch-default DiscriminatorS stack — what the reference actually trains
# (its config-reading branch is dead, descriminators.py:273-282):
# (features, kernel, stride, groups, padding) per conv.
MSD_TORCH_DEFAULT_LAYERS = (
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


class DiscriminatorS(nn.Module):
    """Scale discriminator (descriminators.py:220-264), torch-default arch.

    ``layers`` overrides the conv stack — a framework extension (NOT reference
    behavior; the reference's MSD config branch is dead code) used to build
    structurally identical but small stacks for tests and the multi-chip
    dryrun, where the full 1024-ch k=41 convs dominate CPU-mesh XLA compile
    time (the round-2 driver-timeout root cause, VERDICT.md)."""

    use_spectral_norm: bool = False
    layers: tuple = MSD_TORCH_DEFAULT_LAYERS
    grouped_conv_lowering: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_stats: bool = False):
        """x: (B, T) -> (logits, fmaps)."""
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        fmap = []
        for i, (f, k, s, g, pad) in enumerate(self.layers):
            if self.use_spectral_norm:
                x = SNConv1d(
                    f,
                    k,
                    stride=s,
                    padding=pad,
                    groups=g,
                    grouped_conv_lowering=self.grouped_conv_lowering,
                    name=f"convs_{i}",
                )(x, update_stats=update_stats)
            else:
                x = _wn_conv1d(
                    f, k, s, pad, g, f"convs_{i}", self.grouped_conv_lowering
                )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if self.use_spectral_norm:
            x = SNConv1d(1, 3, padding=1, name="conv_post")(x, update_stats=update_stats)
        else:
            x = _wn_conv1d(1, 3, 1, 1, 1, "conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _wn_conv1d(features, kernel, stride, padding, groups, name, lowering=None):
    from .blocks import Conv1d

    return Conv1d(
        features,
        kernel,
        stride=stride,
        padding=padding,
        groups=groups,
        use_weight_norm=True,
        kernel_init=_normal001,
        grouped_conv_lowering=lowering,
        name=name,
    )


def _avg_pool1d(x: jnp.ndarray, window: int = 4, stride: int = 2, padding: int = 2):
    """torch AvgPool1d(count_include_pad=True) over (B, T)."""
    import numpy as np

    xp = jnp.pad(x, ((0, 0), (padding, padding)))
    # init value must be a concrete constant in the operand dtype (a traced
    # zero breaks reduce_window's transpose rule)
    summed = jax.lax.reduce_window(
        xp, np.zeros((), xp.dtype)[()], jax.lax.add, (1, window), (1, stride), "VALID"
    )
    return summed / np.asarray(window, xp.dtype)[()]


class MultiScaleDiscriminator(nn.Module):
    """(descriminators.py:267-321) — 3 scales x1, /2, /4; first spectral-norm.

    ``layers=None`` builds the torch-default stack (reference parity); a
    tuple-of-tuples overrides every scale's conv spec (see DiscriminatorS)."""

    layers: tuple | None = None
    grouped_conv_lowering: str | None = None
    # concat real+fake into one batch for the WEIGHT-normed scales (1, 2) —
    # bit-identical (batch-row-independent convs), half the programs.  The
    # spectral-norm scale 0 keeps its two sequential calls: its power
    # iteration runs per call (torch hook semantics, the reference's
    # d(y); d(y_hat) updates u twice per step), so batching it would change
    # the second call's sigma.
    batch_pack: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, *, update_stats: bool = False):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        B = y.shape[0]
        for i in range(3):
            d = DiscriminatorS(
                use_spectral_norm=(i == 0),
                layers=self.layers or MSD_TORCH_DEFAULT_LAYERS,
                grouped_conv_lowering=self.grouped_conv_lowering,
                name=f"discriminators_{i}",
            )
            if i != 0:
                y = _avg_pool1d(y)
                y_hat = _avg_pool1d(y_hat)
            if self.batch_pack and i != 0:
                lg, fm = d(jnp.concatenate([y, y_hat], axis=0))
                y_d_r, y_d_g = lg[:B], lg[B:]
                fmap_r = [f[:B] for f in fm]
                fmap_g = [f[B:] for f in fm]
            else:
                kw = {"update_stats": update_stats} if i == 0 else {}
                y_d_r, fmap_r = d(y, **kw)
                y_d_g, fmap_g = d(y_hat, **kw)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
