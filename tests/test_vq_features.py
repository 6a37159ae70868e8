"""Optional VQ features: cosine-sim codebook, stochastic sampling, synchronized
quantize dropout, dead-code expiry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.quantization.vq import (
    GroupedResidualVQ,
    VectorQuantize,
)


def test_cosine_codebook(rng):
    vq = VectorQuantize(dim=16, codebook_size=32, use_cosine_sim=True)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32) * 3)
    variables = vq.init(jax.random.PRNGKey(0), x)
    out, mutated = vq.apply(
        variables, x, training=True, mutable=["codebook"], rngs={}
    )
    # quantized vectors live on the unit sphere... straight-through returns
    # normalized x + sg(delta); at least the gathered codes are unit-norm
    embed = np.asarray(mutated["codebook"]["embed"])
    np.testing.assert_allclose(
        np.linalg.norm(embed, axis=-1), 1.0, rtol=1e-4, atol=1e-4
    )
    out_eval = vq.apply(variables, x)
    q = np.asarray(out_eval.quantized)
    np.testing.assert_allclose(
        np.linalg.norm(q.reshape(-1, 16), axis=-1), 1.0, rtol=1e-3, atol=1e-3
    )


def test_stochastic_sampling_varies(rng):
    vq = VectorQuantize(
        dim=8,
        codebook_size=64,
        stochastic_sample_codes=True,
        sample_codebook_temp=10.0,
    )
    x = jnp.asarray(rng.standard_normal((1, 50, 8)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)
    outs = []
    for seed in range(3):
        out, _ = vq.apply(
            variables,
            x,
            training=True,
            update_ema=False,
            mutable=["codebook"],
            rngs={"gumbel": jax.random.PRNGKey(seed)},
        )
        outs.append(np.asarray(out.indices))
    assert not np.array_equal(outs[0], outs[1])  # stochastic at high temp
    # eval path is deterministic argmin
    e1 = np.asarray(vq.apply(variables, x).indices)
    e2 = np.asarray(vq.apply(variables, x).indices)
    np.testing.assert_array_equal(e1, e2)


def test_quantize_dropout_sync(rng):
    grvq = GroupedResidualVQ(
        dim=16,
        groups=2,
        num_quantizers=4,
        codebook_size=16,
        quantize_dropout=True,
        quantize_dropout_cutoff_index=1,
    )
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    variables = grvq.init(
        jax.random.PRNGKey(0), x
    )
    out, _ = grvq.apply(
        variables,
        x,
        training=True,
        update_ema=False,
        mutable=["codebook"],
        rngs={"quantize_dropout": jax.random.PRNGKey(7)},
    )
    ind = np.asarray(out.indices)  # (G, B, T, R)
    dropped = ind == -1
    # dropout mask identical across groups (synchronized draw)
    np.testing.assert_array_equal(dropped[0], dropped[1])
    # suffix-structured: once dropped, all later layers dropped
    per_layer = dropped.any(axis=(0, 1, 2))
    assert all(
        (not per_layer[r]) or per_layer[r:].all() for r in range(len(per_layer))
    )
    # cutoff 1 => layers 0..1 never dropped entirely... layer 0 never dropped
    assert not per_layer[0]


def test_dead_code_expiry(rng):
    vq = VectorQuantize(dim=8, codebook_size=16, threshold_ema_dead_code=1.0)
    x = jnp.asarray(rng.standard_normal((4, 32, 8)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)
    # zero out cluster sizes so everything is "dead" -> expiry resamples
    cb = dict(variables["codebook"])
    cb["cluster_size"] = jnp.zeros_like(cb["cluster_size"])
    out, mutated = vq.apply(
        {"params": variables.get("params", {}), "codebook": cb},
        x,
        training=True,
        mutable=["codebook"],
        rngs={"codebook_expiry": jax.random.PRNGKey(3)},
    )
    new_cs = np.asarray(mutated["codebook"]["cluster_size"])
    assert (new_cs >= 1.0 - 1e-6).any()  # reset codes get reset_cluster_size
