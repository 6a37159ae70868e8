"""Chain-packed MS-STFT stack (freq_pack="chain") equivalence.

The chain-packed lowering keeps activations W-packed across all six convs
(models/discriminators.py WNConv2d chain mode) — it must reproduce the plain
stack's logits, feature-matching loss, discriminator loss, AND gradients
exactly (same math, different execution shape; fp32 on CPU is deterministic
so the tolerance is round-off only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from distilcodec_nabeel_tpu.training.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32) * 0.1)
    yh = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32) * 0.1)
    kw = dict(
        filters=8,
        n_ffts=(256, 128),
        hop_lengths=(64, 32),
        win_lengths=(256, 128),
    )
    plain = MultiScaleSTFTDiscriminator(freq_pack=0, **kw)
    chain = MultiScaleSTFTDiscriminator(freq_pack="chain", **kw)
    params = plain.init(jax.random.PRNGKey(0), y)
    # identical parameter tree (chain mode is an execution-shape change)
    params_c = chain.init(jax.random.PRNGKey(0), y)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_c
    )
    return plain, chain, params, y, yh


def _unpack_fmaps(fmaps):
    from distilcodec_nabeel_tpu.models.discriminators import chain_unpack

    out = []
    for fm in fmaps:
        cur = []
        for f in fm:
            if isinstance(f, tuple):
                arr, scale = f
                true_w = round(arr.shape[2] * 4 / scale)
                cur.append(chain_unpack(arr, true_w))
            else:
                cur.append(f)
        out.append(cur)
    return out


def test_chain_logits_and_fmaps_match(setup):
    plain, chain, params, y, _ = setup
    lp, fp = plain.apply(params, y)
    lc, fc = chain.apply(params, y)
    fc = _unpack_fmaps(fc)
    for a, b in zip(lp, lc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for fa, fb in zip(fp, fc):
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_chain_losses_match(setup):
    plain, chain, params, y, yh = setup
    lp_r, fp_r = plain.apply(params, y)
    lp_g, fp_g = plain.apply(params, yh)
    lc_r, fc_r = chain.apply(params, y)
    lc_g, fc_g = chain.apply(params, yh)
    # the packed fmaps carry their mean-correction scale: feature_loss on the
    # PACKED pairs must equal the plain feature loss exactly
    fm_p = float(feature_loss(fp_r, fp_g))
    fm_c = float(feature_loss(fc_r, fc_g))
    np.testing.assert_allclose(fm_c, fm_p, rtol=1e-5)
    d_p = float(discriminator_loss(lp_r, lp_g)[0])
    d_c = float(discriminator_loss(lc_r, lc_g)[0])
    np.testing.assert_allclose(d_c, d_p, rtol=1e-5)
    g_p = float(generator_loss(lp_g)[0])
    g_c = float(generator_loss(lc_g)[0])
    np.testing.assert_allclose(g_c, g_p, rtol=1e-5)


def test_chain_gradients_match(setup):
    plain, chain, params, y, yh = setup

    def g_loss(model):
        def f(y_hat):
            lr, fr = model.apply(params, y)
            lg, fg = model.apply(params, y_hat)
            adv, _ = generator_loss(lg)
            return adv + feature_loss(fr, fg)

        return jax.grad(f)(yh)

    gp = g_loss(plain)
    gc = g_loss(chain)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), atol=2e-5)

    def d_loss(model):
        def f(p):
            lr, _ = model.apply(p, y)
            lg, _ = model.apply(p, yh)
            return discriminator_loss(lr, lg)[0]

        return jax.grad(f)(params)

    dp = jax.tree_util.tree_leaves(d_loss(plain))
    dc = jax.tree_util.tree_leaves(d_loss(chain))
    for a, b in zip(dp, dc):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
        )
