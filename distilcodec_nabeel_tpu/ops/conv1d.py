"""MXU-mapped 1-D convolution lowerings.

XLA's native 1-D `conv_general_dilated` lowering on TPU v5e is catastrophically
slow for this model's shapes — measured 172 ms for the decoder's k=13
1024->1024 conv on an (8, 937, 1024) input vs ~9 ms for the same math written
as shifted matmuls (19x).  Every conv in the codec therefore lowers through
this module:

* dense / grouped convs -> sum over taps of (strided-slice @ weight-tap)
  matmuls — K matmuls of (B*T, Cin) x (Cin, Cout), pure MXU work;
* depthwise convs -> K shifted vector FMAs on the VPU;
* transposed convs -> polyphase decomposition: one dense tap-matmul conv per
  output phase, interleaved by reshape — no input dilation, no zero-stuffing,
  1/stride of the naive FLOPs.

All lowerings are numerically identical to the lax reference (unit-tested) and
accumulate in fp32 via ``preferred_element_type`` regardless of compute dtype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def conv1d_mm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Conv over (B, T, Cin) with weight (K, Cin//groups, Cout), torch
    symmetric-padding semantics.  Returns (B, T_out, Cout) in x.dtype."""
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    t_out = (T + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))

    if groups == Cin and Cout == Cin:
        # depthwise: K shifted FMAs (VPU)
        out = jnp.zeros((B, t_out, Cout), jnp.float32)
        for k in range(K):
            start = k * dilation
            sl = jax.lax.slice_in_dim(xp, start, start + (t_out - 1) * stride + 1, stride, axis=1)
            out = out + sl.astype(jnp.float32) * w[k, 0].astype(jnp.float32)
        return out.astype(x.dtype)

    if groups == 1:
        out = jnp.zeros((B, t_out, Cout), jnp.float32)
        for k in range(K):
            start = k * dilation
            sl = jax.lax.slice_in_dim(xp, start, start + (t_out - 1) * stride + 1, stride, axis=1)
            out = out + jnp.matmul(sl, w[k], preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    # grouped: block-diagonal einsum per tap
    cg_in = Cin // groups
    cg_out = Cout // groups
    wg = w.reshape(K, cg_in, groups, cg_out)  # split Cout over groups
    out = jnp.zeros((B, t_out, groups, cg_out), jnp.float32)
    for k in range(K):
        start = k * dilation
        sl = jax.lax.slice_in_dim(xp, start, start + (t_out - 1) * stride + 1, stride, axis=1)
        sl = sl.reshape(B, t_out, groups, cg_in)
        out = out + jnp.einsum(
            "btgi,kigo->btgo",
            sl,
            wg[k : k + 1],
            preferred_element_type=jnp.float32,
        )
    return out.reshape(B, t_out, Cout).astype(x.dtype)


def conv1d_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    padding: int = 0,
    dilation: int = 1,
    pack: int = 4,
) -> jnp.ndarray:
    """Space-to-depth packed conv for small channel counts.

    A stride-1 conv on (B, T, C) with C < 128 wastes most of the MXU's
    128-wide lanes.  Packing ``pack`` consecutive samples into the channel dim
    turns it into an equivalent conv on (B, T/pack, pack*C) with a
    block-structured (M, pack*C, pack*C_out) kernel built from w — fewer,
    fatter matmuls at full lane utilization (at the cost of the kernel's
    structural zeros: M*pack^2*C*C_out vs K*C*C_out MACs).

    Requires stride 1 and T % pack == 0.  Exact vs the unpacked conv.
    """
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    assert T % pack == 0
    S = T // pack
    xp = jnp.pad(x, ((0, 0), (padding, 0), (0, 0)))
    max_off = (pack - 1) + (K - 1) * dilation
    M = max_off // pack + 1
    need = pack * (S + M - 1)
    cur = T + padding
    if need > cur:
        xp = jnp.pad(xp, ((0, 0), (0, need - cur), (0, 0)))
    else:
        xp = xp[:, :need]
    xpk = xp.reshape(B, S + M - 1, pack * Cin)

    wpk = jnp.zeros((M, pack * Cin, pack * Cout), w.dtype)
    for j in range(pack):
        for k in range(K):
            o = j + k * dilation
            m, j2 = divmod(o, pack)
            wpk = wpk.at[
                m, j2 * Cin : (j2 + 1) * Cin, j * Cout : (j + 1) * Cout
            ].add(w[k])

    y = jax.lax.conv_general_dilated(
        xpk,
        wpk,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )  # (B, S, pack*Cout)
    return y.reshape(B, T, Cout).astype(x.dtype)


def conv1d_packed_frames(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    pack: int,
    padding: int = 0,
    dilation: int = 1,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """SAME-length conv on an ALREADY-PACKED (B, S, pack*Cin) tensor,
    returning packed (B, S, pack*Cout).

    Unlike :func:`conv1d_packed` (which packs/unpacks around a single conv —
    measured a loss, DESIGN.md §5), this stays in packed space so a whole
    residual stack pays the relayout once at stage entry/exit.  Measured on
    v5e for the HiFiGAN C=32 final stage (L=240128, pack=4): 28 ms vs 64 ms
    unpacked lax convs vs 209 ms unpacked-with-fp32-bias — the MXU sees
    128-lane matmuls instead of 32.

    Math: represents x of length T = S*pack; y[t] = sum_k w[k]·x[t - padding
    + k*dilation] with zero padding outside [0, T).  Exact (same fp32 MXU
    accumulation; structural zeros add exactly)."""
    B, S, PC = x.shape
    K, Cin, Cout = w.shape
    f = pack
    assert PC == f * Cin, (PC, f, Cin)
    p = padding
    P = -(-p // f) * f  # frame-aligned left pad
    Lf = P // f
    max_o = (f - 1) + (P - p) + (K - 1) * dilation
    M = max_o // f + 1
    R = M - 1 - Lf
    assert R >= 0, (M, Lf)  # holds whenever padding <= (K-1)*dilation + f
    xpad = jnp.pad(x, ((0, 0), (Lf, R), (0, 0)))
    wpk = jnp.zeros((M, f * Cin, f * Cout), w.dtype)
    for j in range(f):
        for k in range(K):
            o = j + (P - p) + k * dilation
            a, b = divmod(o, f)
            wpk = wpk.at[
                a, b * Cin : (b + 1) * Cin, j * Cout : (j + 1) * Cout
            ].add(w[k])
    return jax.lax.conv_general_dilated(
        xpad,
        wpk,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=preferred_element_type,
    )


def conv_transpose1d_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int,
    padding: int = 0,
    f_out: int = 4,
) -> jnp.ndarray:
    """Transposed conv with time-packed output frames for small C_out.

    x: (B, T, Cin) unpacked; w: (K, Cin, Cout) in pre-flipped conv layout
    (what models.blocks.ConvTranspose1d stores); returns (B, T_out, Cout),
    T_out = (T-1)*stride - 2*padding + K (torch semantics).

    The output is produced ``f_out`` samples per packed frame (f_out*Cout
    lanes) from input packed at f_in = f_out/stride — one dense VALID conv,
    full MXU lanes.  The late HiFiGAN upsamples (C_out 64/32) run at 15/5.6
    TFLOP/s unpacked on v5e; exact (fp32 MXU accumulation either way)."""
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    u = stride
    assert f_out % u == 0, (f_out, u)
    f_in = f_out // u
    assert T % f_in == 0, (T, f_in)
    t_out = (T - 1) * u - 2 * padding + K
    pad_total = K - 1 - padding
    S = T // f_in
    S_o = -(-t_out // f_out)

    taps = []  # (jo, j, a, b)
    for jo in range(f_out):
        for j in range(K):
            r = jo + j - pad_total
            if r % u:
                continue
            q = r // u
            a, b = divmod(q, f_in)
            taps.append((jo, j, a, b))
    a_min = min(a for _, _, a, _ in taps)
    a_max = max(a for _, _, a, _ in taps)
    M = a_max - a_min + 1

    xp = x.reshape(B, S, f_in * Cin)
    left = -a_min
    need = S_o + M - 1
    right = max(0, need - (S + left))
    xp = jnp.pad(xp, ((0, 0), (left, right), (0, 0)))[:, :need]

    wpk = jnp.zeros((M, f_in * Cin, f_out * Cout), w.dtype)
    for jo, j, a, b in taps:
        wpk = wpk.at[
            a - a_min, b * Cin : (b + 1) * Cin, jo * Cout : (jo + 1) * Cout
        ].add(w[j])
    y = jax.lax.conv_general_dilated(
        xp,
        wpk,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else x.dtype,
    )  # (B, S_o, f_out*Cout)
    return y.reshape(B, S_o * f_out, Cout)[:, :t_out]


def conv_transpose1d_mm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """Transposed conv over (B, T, Cin), weight in *pre-flipped conv layout*
    (K, Cin, Cout) — the same layout blocks.ConvTranspose1d stores — with
    torch semantics: T_out = (T-1)*stride - 2*padding + K.

    Polyphase: the input-dilated conv's output position t only multiplies
    kernel taps congruent to t modulo stride, so each output phase is its own
    small dense conv; phases are computed as tap-matmul convs and interleaved.
    """
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    u = stride
    t_out = (T - 1) * u - 2 * padding + K
    pad_total = K - 1 - padding  # conv padding of the dilated formulation

    # output position t reads dilated-input positions t+j (j in [0,K)) where
    # (t + j - pad_total) % u == 0 -> real input index (t + j - pad_total)//u.
    # Group t by phase p = t % u.
    n_t = -(-t_out // u)  # ceil: phase-major frame count
    # pad x generously so every phase's gather window is in range
    lead = -(-pad_total // u) + 1
    xp = jnp.pad(x, ((0, 0), (lead, K // u + 2), (0, 0)))
    out_phases = []
    for p in range(u):
        acc = jnp.zeros((B, n_t, Cout), jnp.float32)
        for j in range(K):
            off = p + j - pad_total
            if off % u != 0:
                continue
            q = off // u  # input offset for output frame index m: i = m + q
            # slice xp so that element m corresponds to x[m + q]
            start = lead + q
            sl = jax.lax.slice_in_dim(xp, start, start + n_t, 1, axis=1)
            acc = acc + jnp.matmul(sl, w[j], preferred_element_type=jnp.float32)
        out_phases.append(acc)
    # interleave phases: (B, n_t, u, Cout) -> (B, n_t*u, Cout)
    out = jnp.stack(out_phases, axis=2).reshape(B, n_t * u, Cout)
    return out[:, :t_out].astype(x.dtype)


def grouped_to_dense_kernel(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Expand a grouped-conv kernel (K, Cin/g, Cout) to the equivalent
    block-diagonal DENSE kernel (K, Cin, Cout).

    Why: XLA's gradient decomposition of ``feature_group_count`` convs
    materializes (B, T, g, Cin/g)-shaped activations with the BATCH dim
    minor-most, which tile-pads batch up to the 128-lane width — measured
    6.7-8x memory expansion on the MSD's g=16 convs (2.2 GB per buffer at
    batch 19x72000, the training-step OOM driver; see DESIGN.md).  A dense
    conv with zeros outside the block diagonal computes identical outputs
    and gradients (the einsum with the identity routes each gradient back to
    its block) through XLA's standard, well-laid-out dense conv path, at
    ``groups``x the FLOPs — the right trade wherever the grouped conv is
    memory-bound or lane-starved (Cin/g < 128).

    torch channel convention: group h owns input channels [h*cg, (h+1)*cg)
    and output channels [h*outg, (h+1)*outg).
    """
    k, cg, cout = kernel.shape
    assert cout % groups == 0
    outg = cout // groups
    w = kernel.reshape(k, cg, groups, outg)
    eye = jnp.eye(groups, dtype=kernel.dtype)
    dense = jnp.einsum("kcgo,hg->khcgo", w, eye)
    return dense.reshape(k, groups * cg, cout)


def grouped_lowering() -> str:
    """``DISTILCODEC_GROUPED_CONV``: how non-depthwise grouped convs lower.

    * ``grouped`` (default) — lax ``feature_group_count`` (fewest FLOPs).
    * ``dense`` — block-diagonal masked dense conv via
      ``grouped_to_dense_kernel``: ``groups``x FLOPs, but avoids the
      batch-minor tile-padded gradient buffers of the grouped path (the
      training-memory OOM driver at large batch) and fills all 128 MXU
      lanes.  Read at trace time.
    * ``dense128`` — tile-grouped lowering via
      :func:`grouped_to_tile_grouped_kernel`: block-diagonal dense at
      128-input-channel granularity (``feature_group_count = Cin/128``).
      Keeps the dense path's full lane alignment — every conv group is
      exactly one 128-lane tile — while computing only the diagonal 128-
      tiles of the dense product: 2-8x fewer FLOPs than ``dense`` on the
      MSD's Cin>=256 layers, in the forward AND both gradients.  Since the
      MXU's native output tile is 128x128, per-true-group math (Ci<=64)
      cannot use the array any better than this — the tile-diagonal form is
      the practical MXU floor for these shapes, which is why this lowering
      supersedes the planned handwritten Pallas wgrad kernel (whose only
      remaining edge, tap-resident activation reuse, is worth ~1-15 ms of
      HBM traffic against the MSD's ~GB/s-scale budget).  Falls back to
      ``dense`` where Cin % 128 != 0 or the group structure doesn't embed.
    * ``dense_gw`` — same dense forward and input-gradient, but the WEIGHT
      gradient is computed directly in the small grouped layout
      (:func:`dense_grouped_conv`): the dense path's wgrad is a full
      (K, Cin, Cout) gradient conv whose off-block-diagonal results are
      discarded by the mask — ``groups``x wasted FLOPs (the D-phase
      discriminator budget, DESIGN.md "Training-step attribution").
      Measured NEGATIVE (TODO.md): kept opt-in.
    """
    import os

    return os.environ.get("DISTILCODEC_GROUPED_CONV", "grouped")


def grouped_to_tile_grouped_kernel(
    kernel: jnp.ndarray, groups: int, tile: int = 128
) -> tuple[jnp.ndarray, int]:
    """Expand a grouped-conv kernel (K, Cin/g, Cout) into the equivalent
    TILE-grouped kernel (K, tile, Cout) + its ``feature_group_count``.

    The ``dense`` lowering exists because XLA's gradient decomposition of
    small-group convs (Cin/g < 128) materializes lane-starved, batch-minor
    tile-padded buffers.  But full dense wastes ``groups``x FLOPs.  Middle
    ground: regroup to g2 = Cin//tile conv groups of exactly 128 input
    channels each — r = groups/g2 true groups ride inside each tile block,
    dense within the block (structural zeros between them), disjoint across
    blocks.  Same values and gradients as the grouped conv; r x (not
    groups x) FLOP overhead; every activation/gradient buffer is 128-lane
    aligned.

    torch channel convention as in :func:`grouped_to_dense_kernel`: true
    group h owns input channels [h*Ci, (h+1)*Ci) and output channels
    [h*outg, (h+1)*outg); conv group j = h // r covers input tile
    [j*tile, (j+1)*tile), inside which h sits at local offset (h%r)*Ci.
    """
    k, ci, cout = kernel.shape
    cin = ci * groups
    assert cin % tile == 0 and cout % groups == 0
    g2 = cin // tile
    assert groups % g2 == 0
    r = groups // g2
    outg = cout // groups
    w4 = kernel.reshape(k, ci, groups, outg)
    # route[m, h] = 1 iff true group h sits at within-block slot m
    route = jnp.zeros((r, groups), kernel.dtype)
    route = route.at[
        jnp.arange(groups) % r, jnp.arange(groups)
    ].set(jnp.ones((groups,), kernel.dtype))
    # (k, m, i, h, q) -> (k, r*Ci = tile, groups*outg = Cout)
    w = jnp.einsum("kihq,mh->kmihq", w4, route)
    return w.reshape(k, tile, cout), g2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def dense_grouped_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    groups: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """Grouped conv lowered dense forward with a GROUPED weight gradient.

    x (B, T, Cin), kernel (K, Cin//groups, Cout) in the torch grouped layout
    (group h owns in-channels [h*Ci,(h+1)*Ci) and out-channels
    [h*Co,(h+1)*Co)).  The primal is EXACTLY the ``dense`` lowering (one
    block-diagonal dense conv — same values to the bit), and so is dx (the
    transposed dense conv XLA's autodiff would emit).  Only dw changes
    representation: instead of a full (K, Cin, Cout) dense gradient conv
    whose off-block entries are masked away (``groups``x wasted FLOPs and
    the dominant D-phase cost), it is computed per-tap as the batched
    einsum  dw[k] = einsum('btgi,btgo->igo', x_tap, dy)  — only the useful
    MACs, fp32 accumulated.  Gradient values match the dense path to float
    round-off (same products, different summation order).
    """
    dense = grouped_to_dense_kernel(kernel, groups)
    return jax.lax.conv_general_dilated(
        x,
        dense,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=preferred_element_type,
    )


def _dgc_fwd(x, kernel, groups, stride, padding, dilation, pref):
    y = dense_grouped_conv(x, kernel, groups, stride, padding, dilation, pref)
    return y, (x, kernel)


def _dgc_bwd(groups, stride, padding, dilation, pref, res, dy):
    x, kernel = res
    K, Ci, Cout = kernel.shape
    B, T, Cin = x.shape
    Cog = Cout // groups
    T_out = dy.shape[1]

    # dx: replay XLA's standard dense-conv input gradient (bit-identical to
    # what autodiff of the `dense` lowering produces).  NOTE: vjp over the
    # raw lax conv, NOT over dense_grouped_conv itself (that would re-enter
    # this rule recursively at trace time).
    dense = grouped_to_dense_kernel(kernel, groups)
    fwd_x = lambda xx: jax.lax.conv_general_dilated(
        xx,
        dense,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=pref,
    )
    dx = jax.vjp(fwd_x, x)[1](dy)[0]

    # dw: grouped per-tap contraction — 1/groups of the dense wgrad FLOPs
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    dyg = dy.reshape(B, T_out, groups, Cog)
    span = (T_out - 1) * stride + 1
    dws = []
    for k in range(K):
        start = k * dilation
        sl = jax.lax.slice_in_dim(xp, start, start + span, stride, axis=1)
        slg = sl.reshape(B, T_out, groups, Ci)
        dwk = jnp.einsum(
            "btgi,btgo->igo", slg, dyg, preferred_element_type=jnp.float32
        )
        dws.append(dwk.reshape(Ci, Cout))
    dw = jnp.stack(dws).astype(kernel.dtype)
    return dx, dw


dense_grouped_conv.defvjp(_dgc_fwd, _dgc_bwd)


def grouped_dx_mode() -> str:
    """Input-gradient lowering for stride-1 grouped convs:
    'auto' (XLA's conv transpose) or 'direct' (opt-in,
    DISTILCODEC_GROUPED_DX=direct).

    Measured (probe_dx.py, b16 bf16, v5e): XLA differentiates a grouped
    conv w.r.t. its input through a decomposition that costs 1.99 ms on the
    MSD's k=41 fgc=8 stride-1 layer where the mathematically identical
    direct grouped conv of the cotangent with the flipped, in/out-swapped
    kernel costs 0.77 ms; on STRIDED convs XLA's lhs-dilated backward wins,
    so this only applies at stride 1."""
    import os

    return os.environ.get("DISTILCODEC_GROUPED_DX", "auto")


def grouped_custom_bwd_enabled() -> bool:
    """True when either opt-in backward lowering for stride-1 grouped convs
    is requested (DISTILCODEC_GROUPED_DX=direct and/or
    DISTILCODEC_GROUPED_WGRAD=smallk) — call sites then route through
    grouped_conv_s1_directdx, whose bwd picks per-flag paths."""
    import os

    return (
        grouped_dx_mode() == "direct"
        or os.environ.get("DISTILCODEC_GROUPED_WGRAD", "auto") == "smallk"
    )


def _swap_io_grouped(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """(K, Cin/g, Cout) -> (K, Cout/g, Cin): per-group in/out channel swap
    (the kernel of the adjoint conv)."""
    K, cing, cout = w.shape
    coutg = cout // groups
    w4 = w.reshape(K, cing, groups, coutg)
    w4 = jnp.transpose(w4, (0, 3, 2, 1))
    return w4.reshape(K, coutg, groups * cing)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv_s1_directdx(x, kernel, groups, padding, dilation, pref_name):
    """Stride-1 grouped conv whose input gradient is computed as a DIRECT
    grouped conv (see grouped_dx_mode).  Forward and weight gradient are
    exactly the default path's (the wgrad reuses XLA's own vjp); only dx
    changes executor, not math — value-exact (test_conv_lowering.py)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.dtype(pref_name),
    )


def _gcs1_fwd(x, kernel, groups, padding, dilation, pref_name):
    y = grouped_conv_s1_directdx(x, kernel, groups, padding, dilation, pref_name)
    return y, (x, kernel)


def _gcs1_bwd(groups, padding, dilation, pref_name, res, dy):
    import os

    x, kernel = res
    pref = jnp.dtype(pref_name)
    K = kernel.shape[0]
    if grouped_dx_mode() == "direct":
        # dx: grouped conv of the cotangent with the flipped io-swapped
        # kernel (adjoint padding (K-1)*d - pad; out length == T_in for
        # stride 1)
        wT = _swap_io_grouped(jnp.flip(kernel, 0), groups)
        q = (K - 1) * dilation - padding
        dx = jax.lax.conv_general_dilated(
            dy,
            wT,
            window_strides=(1,),
            padding=[(q, q)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
            preferred_element_type=pref,
        )[:, : x.shape[1]].astype(x.dtype)
    else:

        def f_x(xx):
            return jax.lax.conv_general_dilated(
                xx,
                kernel,
                window_strides=(1,),
                padding=[(padding, padding)],
                rhs_dilation=(dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=groups,
                preferred_element_type=pref,
            )

        dx = jax.vjp(f_x, x)[1](dy)[0]

    smallk = os.environ.get("DISTILCODEC_GROUPED_WGRAD", "auto") == "smallk"
    if smallk and K <= 8:
        # dw as K per-tap grouped einsums.  Rationale: XLA's SMALL-kernel
        # grouped wgrad decomposition measured ~20x its FLOP bound on the
        # MSD's k=5 fgc=8 layer (probe_msd_wgrad.py: 2.49 vs 0.12 ms at
        # b16) while the large-K layers sit at 85-92%.  The per-tap form
        # re-reads the activations once per tap — ruinous at K=41 (the
        # dense_gw negative, DESIGN.md) but ~K x a fraction of a ms here.
        B, T_in, Cin = x.shape
        Cout = dy.shape[-1]
        Ci = Cin // groups
        Cog = Cout // groups
        T_out = dy.shape[1]
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        dyg = dy.reshape(B, T_out, groups, Cog)
        dws = []
        for k in range(K):
            sl = jax.lax.slice_in_dim(
                xp, k * dilation, k * dilation + T_out, 1, axis=1
            )
            slg = sl.reshape(B, T_out, groups, Ci)
            dws.append(
                jnp.einsum(
                    "btgi,btgo->gio",
                    slg,
                    dyg,
                    preferred_element_type=jnp.float32,
                )
            )
        dw = (
            jnp.stack(dws)  # (K, g, Ci, Cog)
            .transpose(0, 2, 1, 3)
            .reshape(K, Ci, Cout)
            .astype(kernel.dtype)
        )
    else:
        # dw: exactly XLA's own weight gradient (vjp of the plain conv)
        def f(w):
            return jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1,),
                padding=[(padding, padding)],
                rhs_dilation=(dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=groups,
                preferred_element_type=pref,
            )

        dw = jax.vjp(f, kernel)[1](dy)[0]
    return dx, dw


grouped_conv_s1_directdx.defvjp(_gcs1_fwd, _gcs1_bwd)
