"""FSQ variant, codebook-sharded argmin, kmeans init, mesh helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from distilcodec_nabeel_tpu.config import QuantizerConfig
from distilcodec_nabeel_tpu.quantization.fsq import (
    DownsampleGRFSQ,
    fsq_codes_from_quantized,
    fsq_quantize,
    fsq_quantized_from_codes,
)
from distilcodec_nabeel_tpu.quantization.kmeans import (
    kmeans,
    kmeans_init_codebook_state,
)
from distilcodec_nabeel_tpu.parallel.codebook_shard import sharded_nearest_code
from distilcodec_nabeel_tpu.quantization.vq import nearest_code_xla


def test_fsq_quantize_roundtrip(rng):
    levels = (8, 5, 5, 5)
    z = jnp.asarray(rng.standard_normal((4, 10, 4)).astype(np.float32) * 3)
    q = fsq_quantize(z, levels)
    codes = fsq_codes_from_quantized(q, levels)
    assert int(codes.max()) < 8 * 5 * 5 * 5
    assert int(codes.min()) >= 0
    q2 = fsq_quantized_from_codes(codes, levels)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)


def test_fsq_gradients_flow(rng):
    levels = (8, 5, 5, 5)
    z = jnp.asarray(rng.standard_normal((20, 4)).astype(np.float32))

    def loss(z):
        return jnp.sum(jnp.square(fsq_quantize(z, levels)))

    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_downsample_grfsq_roundtrip(rng):
    cfg = QuantizerConfig(
        quantizer_type="grfsq",
        input_dim=32,
        n_groups=2,
        n_codebooks=2,
        levels=(8, 5, 5, 5),
        downsample_factor=(2,),
    )
    mod = DownsampleGRFSQ(cfg)
    x = jnp.asarray(rng.standard_normal((2, 20, 32)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    res = mod.apply(variables, x)
    assert res.quantized.shape == (2, 20, 32)
    assert res.codes.shape == (2, 2 * 2, 10)
    # encode/decode consistency
    codes = mod.apply(variables, x, method="encode")
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(res.codes))
    z = mod.apply(variables, codes, method="decode")
    # decode reproduces the upsampled pre-pad/crop quantized path: with
    # factor 2 and even T the shapes match directly
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(res.quantized), rtol=1e-5, atol=1e-5
    )


def test_sharded_codebook_argmin_matches(rng):
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    x = jnp.asarray(rng.standard_normal((37, 16)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    ref = np.asarray(nearest_code_xla(x, e))
    got = np.asarray(sharded_nearest_code(x, e, mesh))
    np.testing.assert_array_equal(got, ref)


def test_sharded_codebook_tie_break(rng):
    """Duplicate codes across shards: lowest global index must win."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    base = rng.standard_normal((8, 16)).astype(np.float32)
    e = np.tile(base, (8, 1))  # every shard holds the same 8 codes
    x = jnp.asarray(base + 1e-4 * rng.standard_normal((8, 16)).astype(np.float32))
    got = np.asarray(sharded_nearest_code(x, jnp.asarray(e), mesh))
    assert (got < 8).all(), got


def test_kmeans_init(rng):
    pts = np.concatenate(
        [
            rng.standard_normal((50, 8)).astype(np.float32) + 5,
            rng.standard_normal((50, 8)).astype(np.float32) - 5,
        ]
    )
    state = kmeans_init_codebook_state(jnp.asarray(pts), 2, num_iters=8)
    means = np.asarray(state["embed"])
    assert means.shape == (2, 8)
    centers = sorted(means.mean(axis=1).tolist())
    assert centers[0] < -3 and centers[1] > 3
    np.testing.assert_allclose(float(np.asarray(state["cluster_size"]).sum()), 100.0)


def test_make_mesh():
    from distilcodec_nabeel_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, time=4, model=1)
    assert mesh.shape == {"data": 2, "time": 4, "model": 1}
