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
