"""Fused Pallas distance+argmin kernel vs naive argmin (interpret mode on the
CPU test mesh; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from distilcodec_nabeel_tpu.ops.vq_argmin import fused_nearest_code
from distilcodec_nabeel_tpu.quantization.vq import nearest_code_xla


@pytest.mark.parametrize(
    "n,k,d,tile_n,tile_k",
    [
        (40, 256, 128, 16, 128),
        (512, 256, 128, 128, 128),
        (100, 512, 256, 64, 128),
    ],
)
def test_fused_matches_xla(rng, n, k, d, tile_n, tile_k):
    x = rng.standard_normal((n, d)).astype(np.float32)
    e = rng.standard_normal((k, d)).astype(np.float32)
    ref = np.asarray(nearest_code_xla(jnp.asarray(x), jnp.asarray(e)))
    got = np.asarray(
        fused_nearest_code(
            jnp.asarray(x),
            jnp.asarray(e),
            tile_n=tile_n,
            tile_k=tile_k,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_fused_tie_break_first_index(rng):
    """Duplicate codebook rows: first index must win (torch argmax tie rule)."""
    d = 128
    base = rng.standard_normal((8, d)).astype(np.float32)
    e = np.concatenate([base, base], axis=0)  # rows i and i+8 identical
    e = np.concatenate([e, rng.standard_normal((112, d)).astype(np.float32) * 10])
    x = base + rng.standard_normal((8, d)).astype(np.float32) * 1e-3
    got = np.asarray(
        fused_nearest_code(
            jnp.asarray(x), jnp.asarray(e), tile_n=8, tile_k=64, interpret=True
        )
    )
    assert (got < 8).all(), got


def test_int8_rescore_matches_high(rng, monkeypatch):
    """int8-scored + fp32-rescored search: near-perfect agreement with the
    exact fp32 argmin (exact on the TPU flagship shape per the measured
    numbers in vq_search_mode; on small random tables a rare int8 ranking
    miss is tolerated)."""
    from distilcodec_nabeel_tpu.quantization.vq import nearest_code_int8

    x = jnp.asarray(rng.standard_normal((400, 128)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((1024, 128)), jnp.float32)
    ref = np.asarray(nearest_code_xla(x, e))
    got = np.asarray(nearest_code_int8(x, e, k=16, recall=0.99))
    agree = (got == ref).mean()
    assert agree >= 0.99, f"agreement {agree:.4f}"
    # every returned id must be a valid candidate (in-range)
    assert got.min() >= 0 and got.max() < 1024


def test_int8_mode_env_dispatch(rng, monkeypatch):
    """DISTILCODEC_VQ_PRECISION=int8 routes nearest_code_xla through the
    int8+rescore path (including k > K clamping on tiny codebooks)."""
    x = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)  # K=8 < k=16
    ref = np.asarray(nearest_code_xla(x, e))
    monkeypatch.setenv("DISTILCODEC_VQ_PRECISION", "int8")
    got = np.asarray(nearest_code_xla(x, e))
    # k clamps to K=8 -> candidate set is the whole table -> exact rescore
    np.testing.assert_array_equal(got, ref)


def test_rescored_matches_exact(rng, monkeypatch):
    """bf16-score + fp32-rescore search agrees with the exact argmin (CPU
    'DEFAULT' precision is already fp32, so agreement here must be perfect;
    on TPU the k=32 rescue absorbs bf16 ranking noise)."""
    from distilcodec_nabeel_tpu.quantization.vq import nearest_code_rescored

    x = jnp.asarray(rng.standard_normal((400, 128)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((1024, 128)), jnp.float32)
    ref = np.asarray(nearest_code_xla(x, e))
    got = np.asarray(nearest_code_rescored(x, e))
    agree = (got == ref).mean()
    assert agree >= 0.99, f"agreement {agree:.4f}"
    # env dispatch incl. k > K clamp
    e8 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    ref8 = np.asarray(nearest_code_xla(x, e8))
    monkeypatch.setenv("DISTILCODEC_VQ_PRECISION", "rescored")
    got8 = np.asarray(nearest_code_xla(x, e8))
    np.testing.assert_array_equal(got8, ref8)
