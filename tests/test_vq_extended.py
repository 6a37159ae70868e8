"""Extended VectorQuantize surface: multi-head codes, affine
re-parameterization, orthogonal regularization, CE commitment, masking,
learnable codebook + in-place optimizer, sync_update_v, ST-gumbel.

Golden parity vs the reference torch implementation
(vector_quantize_pytorch.py) with shared weights wherever the reference path
is runnable on CPU; JAX-only gradient checks for the parts torch validates
implicitly (autograd wiring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.quantization.vq import (
    VectorQuantize,
    in_place_codebook_step,
    orthogonal_loss,
)

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def vqp():
    load_reference()
    from distilcodec.vector_quantization.utils import (  # noqa: E402
        vector_quantize_pytorch,
    )

    return vector_quantize_pytorch


def _codebook_vars(torch_vq, separate: bool):
    """Torch codebook buffers -> our 'codebook' collection (squeeze the
    leading num_codebooks axis when it is 1)."""
    cb = torch_vq._codebook

    def cvt(t, squeeze):
        # .copy(): torch .numpy() shares memory and the reference mutates its
        # buffers in-place during training forwards; jnp.asarray on CPU may
        # alias the numpy buffer zero-copy.
        a = t.detach().numpy().copy()
        return jnp.asarray(a[0] if (squeeze and a.shape[0] == 1) else a)

    sq = not separate
    out = {
        "embed": cvt(cb.embed, sq),
        "embed_avg": cvt(cb.embed_avg, sq),
        "cluster_size": cvt(cb.cluster_size, sq),
        "initted": jnp.float32(float(cb.initted.item())),
    }
    return out


def _pair(vqp, *, dim, codebook_size, heads=1, separate=False, **kw):
    """Matched (torch, ours, variables) with identical codebooks.  ``dim`` is
    chosen as codebook_dim*heads so neither side inserts projections."""
    w = dim // heads
    tref = vqp.VectorQuantize(
        dim=dim,
        codebook_size=codebook_size,
        codebook_dim=w,
        heads=heads,
        separate_codebook_per_head=separate,
        **kw,
    )
    ours = VectorQuantize(
        dim=dim,
        codebook_size=codebook_size,
        codebook_dim=w,
        heads=heads,
        separate_codebook_per_head=separate,
        **{k: v for k, v in kw.items() if k != "sync_codebook"},
    )
    variables = {"codebook": _codebook_vars(tref, separate)}
    return tref, ours, variables


@pytest.mark.parametrize("separate", [False, True])
def test_multihead_eval_parity(vqp, rng, separate):
    H, w, K = 4, 8, 32
    tref, ours, variables = _pair(
        vqp, dim=H * w, codebook_size=K, heads=H, separate=separate
    )
    tref.eval()
    x = rng.standard_normal((2, 6, H * w)).astype(np.float32)
    with torch.no_grad():
        q_ref, ind_ref, _ = tref(torch.from_numpy(x))
    out = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out.indices), ind_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(out.quantized), q_ref.numpy(), rtol=2e-5, atol=2e-5
    )
    # decode-from-indices round trip matches the quantized output
    dec = ours.apply(
        variables, out.indices, method=VectorQuantize.decode_indices
    )
    np.testing.assert_allclose(
        np.asarray(dec), q_ref.numpy(), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("separate", [False, True])
def test_multihead_training_ema_parity(vqp, rng, separate):
    H, w, K = 2, 8, 16
    tref, ours, variables = _pair(
        vqp, dim=H * w, codebook_size=K, heads=H, separate=separate, decay=0.8
    )
    tref.train()
    x = rng.standard_normal((2, 10, H * w)).astype(np.float32)
    q_ref, ind_ref, loss_ref = tref(torch.from_numpy(x))
    out, mutated = ours.apply(
        variables, jnp.asarray(x), training=True, mutable=["codebook"]
    )
    np.testing.assert_array_equal(np.asarray(out.indices), ind_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(out.quantized),
        q_ref.detach().numpy(),
        rtol=2e-5,
        atol=2e-5,
    )
    cb = tref._codebook
    emb_ref = cb.embed.detach().numpy()
    emb_ours = np.asarray(mutated["codebook"]["embed"])
    if not separate:
        emb_ref = emb_ref[0]
    np.testing.assert_allclose(emb_ours, emb_ref, rtol=2e-4, atol=2e-4)
    cs_ref = cb.cluster_size.detach().numpy()
    cs_ours = np.asarray(mutated["codebook"]["cluster_size"])
    if not separate:
        cs_ref = cs_ref[0]
    np.testing.assert_allclose(cs_ours, cs_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(out.commit_loss), float(loss_ref.item()), rtol=1e-4, atol=1e-5
    )


def test_affine_param_training_parity(vqp, rng):
    w, K = 8, 16
    tref, ours, variables = _pair(
        vqp,
        dim=w,
        codebook_size=K,
        affine_param=True,
        affine_param_batch_decay=0.99,
        affine_param_codebook_decay=0.9,
    )
    tref.train()
    vars_now = variables
    for step in range(3):
        x = rng.standard_normal((2, 12, w)).astype(np.float32)
        q_ref, ind_ref, loss_ref = tref(torch.from_numpy(x))
        out, mutated = ours.apply(
            vars_now, jnp.asarray(x), training=True, mutable=["codebook"]
        )
        vars_now = {"codebook": mutated["codebook"]}
        np.testing.assert_array_equal(
            np.asarray(out.indices), ind_ref.numpy(), err_msg=f"step {step}"
        )
        np.testing.assert_allclose(
            np.asarray(out.quantized),
            q_ref.detach().numpy(),
            rtol=5e-5,
            atol=5e-5,
        )
        np.testing.assert_allclose(
            float(out.commit_loss), float(loss_ref.item()), rtol=1e-4, atol=1e-5
        )
    cb = tref._codebook
    for name in ("batch_mean", "batch_variance", "codebook_mean", "codebook_variance"):
        ref_v = getattr(cb, name).detach().numpy()
        ours_v = np.asarray(vars_now["codebook"][name])
        np.testing.assert_allclose(
            ours_v, ref_v, rtol=2e-4, atol=2e-4, err_msg=name
        )
    emb_ref = cb.embed.detach().numpy()[0]
    np.testing.assert_allclose(
        np.asarray(vars_now["codebook"]["embed"]), emb_ref, rtol=3e-4, atol=3e-4
    )


def test_orthogonal_loss_matches_reference(vqp, rng):
    t = rng.standard_normal((3, 12, 8)).astype(np.float32)
    ref_val = float(vqp.orthogonal_loss_fn(torch.from_numpy(t)).item())
    ours_val = float(orthogonal_loss(jnp.asarray(t)))
    np.testing.assert_allclose(ours_val, ref_val, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("active_only", [False, True])
def test_orthogonal_reg_forward_parity(vqp, rng, active_only):
    w, K = 8, 16
    tref, ours, variables = _pair(
        vqp,
        dim=w,
        codebook_size=K,
        orthogonal_reg_weight=0.7,
        orthogonal_reg_active_codes_only=active_only,
        ema_update=True,
    )
    tref.train()
    x = rng.standard_normal((2, 20, w)).astype(np.float32)
    *_, breakdown = tref(torch.from_numpy(x), return_loss_breakdown=True)
    out, _ = ours.apply(
        variables, jnp.asarray(x), training=True, mutable=["codebook"]
    )
    np.testing.assert_allclose(
        float(out.orthogonal_loss),
        float(breakdown.orthogonal_reg.item()),
        rtol=1e-4,
        atol=1e-6,
    )


def test_ce_commitment_parity(vqp, rng):
    w, K = 8, 16
    tref, ours, variables = _pair(
        vqp,
        dim=w,
        codebook_size=K,
        commitment_use_cross_entropy_loss=True,
    )
    tref.train()
    x = rng.standard_normal((2, 9, w)).astype(np.float32)
    *_, breakdown = tref(torch.from_numpy(x), return_loss_breakdown=True)
    out, _ = ours.apply(
        variables, jnp.asarray(x), training=True, mutable=["codebook"]
    )
    np.testing.assert_allclose(
        float(out.commit_loss),
        float(breakdown.commitment.item()),
        rtol=1e-4,
        atol=1e-6,
    )


def test_target_indices_ce_parity(vqp, rng):
    w, K = 8, 16
    tref, ours, variables = _pair(vqp, dim=w, codebook_size=K)
    tref.eval()
    x = rng.standard_normal((2, 9, w)).astype(np.float32)
    codes = rng.integers(0, K, size=(2, 9))
    with torch.no_grad():
        _, ce_ref = tref(
            torch.from_numpy(x), indices=torch.from_numpy(codes)
        )
    out = ours.apply(
        variables, jnp.asarray(x), target_indices=jnp.asarray(codes)
    )
    np.testing.assert_allclose(
        float(out.ce_loss), float(ce_ref.item()), rtol=1e-4, atol=1e-6
    )


def test_mask_training_parity(vqp, rng):
    w, K = 8, 16
    tref, ours, variables = _pair(vqp, dim=w, codebook_size=K, decay=0.8)
    tref.train()
    x = rng.standard_normal((2, 10, w)).astype(np.float32)
    lens = np.array([7, 4])
    mask = np.arange(10)[None, :] < lens[:, None]
    q_ref, ind_ref, loss_ref = tref(
        torch.from_numpy(x), mask=torch.from_numpy(mask)
    )
    out, mutated = ours.apply(
        variables,
        jnp.asarray(x),
        training=True,
        mask=jnp.asarray(mask),
        mutable=["codebook"],
    )
    np.testing.assert_array_equal(np.asarray(out.indices), ind_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(out.quantized),
        q_ref.detach().numpy(),
        rtol=2e-5,
        atol=2e-5,
    )
    # masked positions: indices -1, quantized zeros
    assert (np.asarray(out.indices)[~mask] == -1).all()
    assert np.abs(np.asarray(out.quantized)[~mask]).max() == 0.0
    # EMA only accumulated over valid tokens
    emb_ref = tref._codebook.embed.detach().numpy()[0]
    np.testing.assert_allclose(
        np.asarray(mutated["codebook"]["embed"]), emb_ref, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        float(out.commit_loss), float(loss_ref.item()), rtol=1e-4, atol=1e-5
    )


def test_learnable_codebook_grad_flow(rng):
    w, K = 8, 16
    vq = VectorQuantize(
        dim=w, codebook_size=K, learnable_codebook=True, ema_update=False
    )
    x = jnp.asarray(rng.standard_normal((2, 6, w)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)

    def loss_fn(codebook):
        out = vq.apply(
            {"codebook": codebook}, x, training=True, update_ema=False
        )
        return out.commit_loss

    grads = jax.grad(loss_fn)(variables["codebook"])
    assert float(jnp.abs(grads["embed"]).max()) > 0.0

    # non-learnable: commitment detaches the codebook -> zero grads
    vq0 = VectorQuantize(dim=w, codebook_size=K)
    g0 = jax.grad(
        lambda cb: vq0.apply(
            {"codebook": cb}, x, training=True, update_ema=False
        ).commit_loss
    )(variables["codebook"])
    assert float(jnp.abs(g0["embed"]).max()) == 0.0


def test_in_place_codebook_step_reduces_mse(rng):
    import optax

    w, K = 8, 16
    vq = VectorQuantize(
        dim=w, codebook_size=K, learnable_codebook=True, ema_update=False
    )
    x = jnp.asarray(rng.standard_normal((2, 32, w)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)
    opt = optax.sgd(0.5)
    opt_state = opt.init(variables["codebook"])
    losses = []
    for _ in range(5):
        variables, opt_state, loss = in_place_codebook_step(
            vq, variables, x, opt, opt_state
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sync_update_v_changes_grad_not_value(rng):
    w, K = 8, 16
    x = jnp.asarray(rng.standard_normal((1, 5, w)).astype(np.float32))
    base = VectorQuantize(dim=w, codebook_size=K)
    v = VectorQuantize(dim=w, codebook_size=K, sync_update_v=0.5,
                       learnable_codebook=True, ema_update=False)
    variables = base.init(jax.random.PRNGKey(0), x)
    o1, _ = base.apply(
        variables, x, training=True, update_ema=False, mutable=["codebook"]
    )
    o2 = v.apply(variables, x, training=True, update_ema=False)
    # forward value identical (the v-term is zero in value, gradient-only)
    np.testing.assert_allclose(
        np.asarray(o1.quantized), np.asarray(o2.quantized), rtol=1e-6, atol=1e-6
    )


def test_straight_through_gumbel_grads(rng):
    w, K = 8, 16
    vq = VectorQuantize(
        dim=w,
        codebook_size=K,
        stochastic_sample_codes=True,
        sample_codebook_temp=1.0,
        straight_through=True,
    )
    x = jnp.asarray(rng.standard_normal((1, 5, w)).astype(np.float32))
    variables = vq.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, training=True,
    )

    def loss_fn(xin):
        out = vq.apply(
            variables,
            xin,
            training=True,
            update_ema=False,
            rngs={"gumbel": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out.quantized)

    g = jax.grad(loss_fn)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_reinmax_runs(rng):
    w, K = 8, 16
    vq = VectorQuantize(
        dim=w,
        codebook_size=K,
        stochastic_sample_codes=True,
        sample_codebook_temp=1.0,
        straight_through=True,
        reinmax=True,
    )
    x = jnp.asarray(rng.standard_normal((1, 5, w)).astype(np.float32))
    variables = vq.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, training=True,
    )
    out = vq.apply(
        variables, x, training=True, update_ema=False,
        rngs={"gumbel": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(out.quantized)).all()


def test_orthogonal_max_codes_subsets(rng):
    w, K = 8, 32
    vq = VectorQuantize(
        dim=w,
        codebook_size=K,
        orthogonal_reg_weight=1.0,
        orthogonal_reg_max_codes=8,
    )
    x = jnp.asarray(rng.standard_normal((2, 10, w)).astype(np.float32))
    variables = vq.init(
        {"params": jax.random.PRNGKey(0),
         "orthogonal_reg": jax.random.PRNGKey(2)},
        x, training=True,
    )
    out, _ = vq.apply(
        variables, x, training=True, mutable=["codebook"],
        rngs={"orthogonal_reg": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out.orthogonal_loss))
