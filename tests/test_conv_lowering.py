"""conv1d matmul lowerings vs the lax reference — exact semantics across
stride/dilation/groups/transpose configurations used anywhere in the codec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.ops.conv1d import conv1d_mm, conv_transpose1d_mm


def lax_conv(x, w, stride, padding, dilation, groups):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def lax_convtr(x, w, stride, padding):
    k = w.shape[0]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,dilation,groups",
    [
        (16, 24, 13, 1, 6, 1, 1),  # conv_pre-like
        (16, 24, 7, 1, 3, 1, 1),  # stem-like
        (16, 16, 7, 1, 3, 1, 16),  # depthwise ConvNeXt
        (16, 16, 11, 1, 25, 5, 1),  # dilated resblock conv
        (8, 24, 41, 2, 20, 1, 4),  # MSD grouped strided
        (16, 24, 41, 4, 20, 1, 8),  # MSD grouped stride 4
        (16, 24, 1, 1, 0, 1, 1),  # 1x1 expander
        (16, 24, 2, 2, 0, 1, 1),  # teacher downsample factor 2
    ],
)
def test_conv_mm_matches_lax(rng, cin, cout, k, stride, padding, dilation, groups):
    x = jnp.asarray(rng.standard_normal((2, 50, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)).astype(np.float32)
    )
    ref = lax_conv(x, w, stride, padding, dilation, groups)
    got = conv1d_mm(
        x, w, stride=stride, padding=padding, dilation=dilation, groups=groups
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding",
    [
        (16, 8, 16, 8, 4),  # HiFiGAN up stage (k=16, u=8)
        (16, 8, 12, 4, 4),  # (k=12, u=4)
        (16, 8, 4, 2, 1),  # (k=4, u=2)
        (16, 8, 2, 2, 0),  # teacher quantizer upsample
        (16, 8, 1, 1, 0),  # student quantizer upsample (k=1)
        (16, 8, 5, 3, 1),  # k not multiple of u
    ],
)
def test_convtr_mm_matches_lax(rng, cin, cout, k, stride, padding):
    x = jnp.asarray(rng.standard_normal((2, 30, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32))
    ref = lax_convtr(x, w, stride, padding)
    got = conv_transpose1d_mm(x, w, stride=stride, padding=padding)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "c,k,dilation,pack",
    [
        (16, 3, 1, 4),
        (16, 7, 1, 4),
        (16, 11, 5, 4),
        (32, 11, 5, 2),
        (16, 3, 3, 8),
    ],
)
def test_conv1d_packed_matches_lax(rng, c, k, dilation, pack):
    from distilcodec_nabeel_tpu.ops.conv1d import conv1d_packed

    pad = (k * dilation - dilation) // 2
    x = jnp.asarray(rng.standard_normal((2, 64, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
    ref = lax_conv(x, w, 1, pad, dilation, 1)
    got = conv1d_packed(x, w, padding=pad, dilation=dilation, pack=pack)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "c,k,dilation,pack",
    [
        (32, 3, 1, 4),
        (32, 7, 3, 4),
        (32, 11, 5, 4),
        (16, 13, 6, 8),
        (64, 3, 1, 2),
        (32, 4, 1, 4),  # even kernel (asymmetric-pad family)
    ],
)
def test_conv1d_packed_frames_matches_lax(rng, c, k, dilation, pack):
    """Whole-stage packed conv: packed-in/packed-out SAME-length conv equals
    the plain lax conv after unpacking."""
    from distilcodec_nabeel_tpu.ops.conv1d import conv1d_packed_frames

    pad = (k * dilation - dilation) // 2
    T = 96
    x = jnp.asarray(rng.standard_normal((2, T, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
    ref = lax_conv(x, w, 1, pad, dilation, 1)
    xp = x.reshape(2, T // pack, pack * c)
    got = conv1d_packed_frames(
        xp, w, pack=pack, padding=pad, dilation=dilation
    ).reshape(2, -1, c)[:, :ref.shape[1]]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_parallel_block_packed_matches_unpacked(rng, monkeypatch):
    """ParallelBlock auto-packing (C=32 -> pack 4) is numerically equivalent
    to the unpacked stack (same weights via identical param tree)."""
    from distilcodec_nabeel_tpu.models.blocks import ParallelBlock

    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    mod = ParallelBlock(32)
    vs = mod.init(jax.random.PRNGKey(0), x)
    packed = mod.apply(vs, x)  # C=32 & T%4==0 -> packed path
    monkeypatch.setenv("DISTILCODEC_PACK_RESBLOCKS", "0")
    ref = mod.apply(vs, x)
    np.testing.assert_allclose(packed, ref, rtol=1e-5, atol=1e-5)
    # odd length -> packing silently disabled, still correct shape
    x65 = jnp.asarray(rng.standard_normal((2, 65, 32)).astype(np.float32))
    y65 = mod.apply(vs, x65)
    assert y65.shape == (2, 65, 32)


def test_parallel_block_pack_maxc64_matches(rng, monkeypatch):
    """The inference decode's pack_maxc=64 (C=64 stage packed at f=2,
    633.8 -> 643.6 au-s/s round trip, r3) is numerically equivalent to the
    unpacked stack."""
    from distilcodec_nabeel_tpu.models.blocks import ParallelBlock

    x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    mod64 = ParallelBlock(64, pack_maxc=64)
    vs = mod64.init(jax.random.PRNGKey(0), x)
    packed = mod64.apply(vs, x)
    monkeypatch.setenv("DISTILCODEC_PACK_RESBLOCKS", "0")
    ref = ParallelBlock(64).apply(vs, x)
    np.testing.assert_allclose(packed, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,u,f_out",
    [
        (64, 32, 4, 2, 4),
        (128, 64, 4, 2, 2),
        (64, 32, 16, 8, 8),
        (32, 16, 12, 4, 8),
        (16, 8, 3, 1, 8),
    ],
)
def test_conv_transpose1d_packed_matches_lax(rng, cin, cout, k, u, f_out):
    from distilcodec_nabeel_tpu.ops.conv1d import conv_transpose1d_packed

    pad = (k - u) // 2 if k >= u else 0
    T = 48
    x = jnp.asarray(rng.standard_normal((2, T, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1 - pad, k - 1 - pad)],
        lhs_dilation=(u,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    got = conv_transpose1d_packed(x, w, stride=u, padding=pad, f_out=f_out)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_grouped_dense_lowering_matches(rng, monkeypatch):
    """DISTILCODEC_GROUPED_CONV=dense: block-diagonal masked dense conv ==
    feature_group_count conv, values and gradients."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import Conv1d
    from distilcodec_nabeel_tpu.ops.conv1d import grouped_to_dense_kernel

    # kernel-level identity
    w = jnp.asarray(rng.standard_normal((5, 8, 32)).astype(np.float32))
    dense = grouped_to_dense_kernel(w, 4)
    assert dense.shape == (5, 32, 32)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=4,
    )
    got = jax.lax.conv_general_dilated(
        x, dense, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # module-level, including weight-norm params and gradients
    conv = Conv1d(32, 5, padding=2, groups=4, use_weight_norm=True)
    variables = conv.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)))

    g_ref = jax.grad(loss)(variables, x)
    y_ref = conv.apply(variables, x)
    monkeypatch.setenv("DISTILCODEC_GROUPED_CONV", "dense")
    jax.clear_caches()
    y_dense = conv.apply(variables, x)
    g_dense = jax.grad(loss)(variables, x)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_ref), atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_dense), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    monkeypatch.delenv("DISTILCODEC_GROUPED_CONV")
    jax.clear_caches()


@pytest.mark.parametrize(
    "cin,cout,groups,k,stride",
    [
        (256, 512, 16, 41, 4),  # MSD layer 4 structure (g2=2, r=8)
        (512, 1024, 16, 41, 4),  # MSD layer 5 (g2=4, r=4)
        (1024, 1024, 16, 5, 1),  # MSD layer 6/7 family (g2=8, r=2)
        (128, 128, 4, 5, 2),  # Cin=128 -> g2=1: degenerates to dense
        (96, 96, 4, 5, 1),  # Cin%128 != 0: falls back to plain dense
    ],
)
def test_grouped_dense128_lowering_matches(
    rng, monkeypatch, cin, cout, groups, k, stride
):
    """grouped_conv='dense128' (tile-grouped lowering): block-diagonal dense
    at 128-input-channel granularity == the true grouped conv, values and
    gradients, across the real MSD layer structures."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import Conv1d
    from distilcodec_nabeel_tpu.ops.conv1d import (
        grouped_to_tile_grouped_kernel,
    )

    # kernel-level identity where the structure embeds
    w = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal((2, 96, cin)).astype(np.float32))
    pad = k // 2
    ref = jax.lax.conv_general_dilated(
        x,
        w,
        (stride,),
        [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if cin % 128 == 0 and groups % (cin // 128) == 0:
        wt, g2 = grouped_to_tile_grouped_kernel(w, groups)
        assert wt.shape == (k, 128, cout) and g2 == cin // 128
        got = jax.lax.conv_general_dilated(
            x,
            wt,
            (stride,),
            [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=g2,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=2e-5
        )

    # module-level (covers the fallback paths), values + gradients
    conv = Conv1d(cout, k, stride=stride, padding=pad, groups=groups,
                  use_weight_norm=True)
    variables = conv.init(jax.random.PRNGKey(0), x)

    def loss(v, xx):
        return jnp.sum(jnp.square(conv.apply(v, xx)))

    y_ref = conv.apply(variables, x)
    g_ref = jax.grad(loss)(variables, x)
    monkeypatch.setenv("DISTILCODEC_GROUPED_CONV", "dense128")
    jax.clear_caches()
    y_t = conv.apply(variables, x)
    g_t = jax.grad(loss)(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_t), np.asarray(y_ref), atol=3e-4, rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_t), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-5
        )
    monkeypatch.delenv("DISTILCODEC_GROUPED_CONV")
    jax.clear_caches()


def test_grouped_dense128_snconv_matches(rng, monkeypatch):
    """The spectral-normed MSD conv path honors dense128 too (module
    attribute, no env)."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.discriminators import SNConv1d

    x = jnp.asarray(rng.standard_normal((2, 64, 256)).astype(np.float32))
    ref_conv = SNConv1d(512, 41, stride=4, padding=20, groups=16)
    t_conv = SNConv1d(
        512, 41, stride=4, padding=20, groups=16,
        grouped_conv_lowering="dense128",
    )
    variables = ref_conv.init(jax.random.PRNGKey(0), x)
    y_ref = ref_conv.apply(variables, x)
    y_t = t_conv.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_t), np.asarray(y_ref), atol=3e-4, rtol=2e-5
    )

    def loss(conv, v, xx):
        return jnp.sum(jnp.square(conv.apply(v, xx)))

    g_ref = jax.grad(lambda v: loss(ref_conv, v, x))(variables)
    g_t = jax.grad(lambda v: loss(t_conv, v, x))(variables)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_t), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-5
        )


def test_grouped_dense_gw_lowering_matches(rng, monkeypatch):
    """DISTILCODEC_GROUPED_CONV=dense_gw: primal identical to the dense
    lowering (same block-diag dense conv), dx identical, and the grouped
    weight gradient matches the grouped-conv autodiff to float round-off
    (same products, different summation order).  Covers the MSD shapes:
    strided + grouped, both weight-normed Conv1d and spectral-norm SNConv1d."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import Conv1d
    from distilcodec_nabeel_tpu.models.discriminators import SNConv1d

    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))

    for conv, kwargs in (
        (Conv1d(32, 5, padding=2, groups=4, use_weight_norm=True), {}),
        (Conv1d(64, 41, stride=2, padding=20, groups=4), {}),
        (SNConv1d(64, 41, stride=2, padding=20, groups=4), {"update_stats": False}),
    ):
        variables = conv.init(jax.random.PRNGKey(0), x, **kwargs)

        def loss(v, x):
            return jnp.sum(jnp.square(conv.apply(v, x, **kwargs)))

        y_ref = conv.apply(variables, x, **kwargs)
        g_ref = jax.grad(loss)(variables, x)
        gx_ref = jax.grad(loss, argnums=1)(variables, x)
        monkeypatch.setenv("DISTILCODEC_GROUPED_CONV", "dense_gw")
        jax.clear_caches()
        y_gw = conv.apply(variables, x, **kwargs)
        g_gw = jax.grad(loss)(variables, x)
        gx_gw = jax.grad(loss, argnums=1)(variables, x)
        monkeypatch.delenv("DISTILCODEC_GROUPED_CONV")
        jax.clear_caches()

        np.testing.assert_allclose(np.asarray(y_gw), np.asarray(y_ref), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(gx_gw), np.asarray(gx_ref), atol=2e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_gw), jax.tree_util.tree_leaves(g_ref)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4
            )


def test_msstft_freq_pack_matches(rng, monkeypatch):
    """DISTILCODEC_MSSTFT_PACK=4: exact freq->lane space-to-depth lowering of
    every MS-STFT conv — full discriminator logits+fmaps AND parameter
    gradients equal the unpacked path."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.discriminators import WNConv2d
    from distilcodec_nabeel_tpu.models.msstftd import MultiScaleSTFTDiscriminator

    # conv-level identity across the shapes MS-STFT uses: (kw 9 s 2), (kw 9
    # s 1), (kw 3 s 1), incl. time dilation and a non-divisible W
    x = jnp.asarray(rng.standard_normal((2, 12, 41, 6)).astype(np.float32))
    for kw, s, dil in ((9, 2, 1), (9, 1, 2), (3, 1, 4)):
        ref_conv = WNConv2d(
            8, (3, kw), strides=(1, s), padding=(dil, (kw - 1) // 2),
            dilation=(dil, 1),
        )
        v = ref_conv.init(jax.random.PRNGKey(0), x)
        pk_conv = WNConv2d(
            8, (3, kw), strides=(1, s), padding=(dil, (kw - 1) // 2),
            dilation=(dil, 1), freq_pack=4,
        )
        y_ref = ref_conv.apply(v, x)
        y_pk = pk_conv.apply(v, x)
        assert y_pk.shape == y_ref.shape, (kw, s, dil)
        np.testing.assert_allclose(
            np.asarray(y_pk), np.asarray(y_ref), atol=2e-5
        )

        def loss(vv, conv):
            return jnp.sum(jnp.square(conv.apply(vv, x)))

        g_ref = jax.grad(loss)(v, ref_conv)
        g_pk = jax.grad(loss)(v, pk_conv)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_pk), jax.tree_util.tree_leaves(g_ref)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            )

    # full-discriminator identity (small ffts for speed)
    msstft = MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128),
    )
    audio = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32) * 0.1)
    variables = msstft.init(jax.random.PRNGKey(1), audio)

    def dloss(v, a):
        logits, fmaps = msstft.apply(v, a)
        return sum(jnp.mean(jnp.square(1.0 - l)) for l in logits) + sum(
            jnp.mean(jnp.abs(f)) for fm in fmaps for f in fm
        )

    y_ref, f_ref = msstft.apply(variables, audio)
    g_ref = jax.grad(dloss)(variables, audio)
    monkeypatch.setenv("DISTILCODEC_MSSTFT_PACK", "4")
    jax.clear_caches()
    y_pk, f_pk = msstft.apply(variables, audio)
    g_pk = jax.grad(dloss)(variables, audio)
    for a, b in zip(y_pk, y_ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for fa, fb in zip(f_pk, f_ref):
        for a, b in zip(fa, fb):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pk), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_gelu_approx_env_flag(monkeypatch, rng):
    """DISTILCODEC_GELU_APPROX=1 swaps the ConvNeXt blocks' exact-erf GELU
    for the tanh approximation (opt-in serving recipe, models/blocks.py):
    outputs must differ from exact (the flag is live) but stay within the
    approximation's known error envelope; gelu_approx=False pins exact
    regardless of env."""
    import os

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import ConvNeXtBlock

    x = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    blk_env = ConvNeXtBlock(dim=16, layer_scale_init_value=0.0)
    params = blk_env.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("DISTILCODEC_GELU_APPROX", "0")
    y_exact = blk_env.apply(params, x)
    monkeypatch.setenv("DISTILCODEC_GELU_APPROX", "1")
    y_approx = blk_env.apply(params, x)
    d = float(jnp.max(jnp.abs(y_exact - y_approx)))
    assert 0 < d < 1e-2
    # attr overrides env
    y_pinned = ConvNeXtBlock(
        dim=16, layer_scale_init_value=0.0, gelu_approx=False
    ).apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_pinned), np.asarray(y_exact))


def test_grouped_dx_direct_matches(monkeypatch, rng):
    """DISTILCODEC_GROUPED_DX=direct (stride-1 grouped convs compute their
    input gradient as a direct grouped conv of the cotangent — probe_dx.py)
    and DISTILCODEC_GROUPED_WGRAD=smallk (per-tap einsum weight gradient
    for K<=8) must reproduce the default path's values and gradients to
    accumulation round-off (the smallk dw sums in a different order),
    through Conv1d and SNConv1d, including a dilated case."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import Conv1d
    from distilcodec_nabeel_tpu.models.discriminators import SNConv1d

    x = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))

    for mod, kw in (
        (Conv1d, dict(features=24, kernel_size=5, padding=2, groups=4,
                      use_weight_norm=True)),
        (Conv1d, dict(features=24, kernel_size=5, padding=4, dilation=2,
                      groups=4)),
        (SNConv1d, dict(features=24, kernel_size=5, padding=2, groups=4)),
    ):
        m = mod(**kw)
        params = m.init(jax.random.PRNGKey(0), x)

        def run(v, xx):
            y = m.apply(v, xx)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.1)), y

        monkeypatch.setenv("DISTILCODEC_GROUPED_DX", "auto")
        (la, ya), ga = jax.value_and_grad(run, argnums=(0, 1), has_aux=True)(
            params, x
        )
        monkeypatch.setenv("DISTILCODEC_GROUPED_DX", "direct")
        monkeypatch.setenv("DISTILCODEC_GROUPED_WGRAD", "smallk")
        (lb, yb), gb = jax.value_and_grad(run, argnums=(0, 1), has_aux=True)(
            params, x
        )
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
            )
