"""Time-sharded halo-exchange correctness: sharded == unsharded exactly.

The strongest guarantee in the parallel layer — codes and waveforms from the
8-device time-sharded path must match the single-device computation
bit-for-bit (identical ops, identical padding semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.parallel.halo import HaloConfig, TimeShardedCodec
from test_codec_facade import MINI_CONFIG


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(MINI_CONFIG)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("time",))


@pytest.fixture(scope="module")
def sharded(codec, mesh):
    # mini encoder: stem(3) + 2 blocks(3) + quant block(3) = 12 frames
    return TimeShardedCodec(
        codec.module,
        codec.variables,
        mesh,
        halo=HaloConfig(encoder_halo_frames=16, decoder_halo_frames=16),
    )


def test_sharded_encode_matches_unsharded(codec, sharded, rng):
    hop = 64
    n_frames = 8 * 40  # divides 8 shards; chunk 40 > 2*halo
    audio = (rng.standard_normal(n_frames * hop) * 0.2).astype(np.float32)

    codes_sharded = sharded.encode_codes(audio)  # (T, G*R)

    # unsharded reference: same audio (no extra padding needed: already
    # a multiple of n*hop), module.encode_codes on the whole stream
    ref = codec.module.apply(
        codec.variables, jnp.asarray(audio[None]), method="encode_codes"
    )  # (1, G*R, T)
    ref = np.asarray(ref)[0].T
    assert codes_sharded.shape == ref.shape
    mismatch = (codes_sharded != ref).sum()
    assert mismatch == 0, f"{mismatch}/{ref.size} code mismatches"


def test_sharded_decode_matches_unsharded(codec, rng, mesh):
    # boost the codebook so the decoded signal is O(0.1) rather than the
    # random-init ~1e-10 (a meaningful comparison scale)
    import jax.tree_util as jtu

    variables = jtu.tree_map(lambda x: x, codec.variables)
    cb = variables["codebook"]["quantizer"]["grvq"]["rvqs_0"]["layers_0"]
    cb["embed"] = cb["embed"] * 1e5

    sharded = TimeShardedCodec(
        codec.module,
        variables,
        mesh,
        halo=HaloConfig(encoder_halo_frames=16, decoder_halo_frames=16),
    )
    n_frames = 8 * 40
    codes = rng.integers(0, 64, size=(n_frames,), dtype=np.int32)

    wave_sharded = sharded.decode_codes(codes)

    ind = jnp.asarray(codes.reshape(1, 1, -1, 1))
    ref = np.asarray(
        codec.module.apply(variables, ind, method="decode_codes")
    )[0]
    assert wave_sharded.shape == ref.shape
    scale = np.abs(ref).max()
    assert scale > 1e-4  # non-degenerate signal
    np.testing.assert_allclose(
        wave_sharded, ref, rtol=1e-5, atol=1e-5 * scale
    )


def test_sharded_encode_ragged_length(codec, sharded, rng):
    """Non-divisible lengths: sharded path pads internally; the valid prefix
    must still match the unsharded computation on the padded audio."""
    hop = 64
    L = 8 * 40 * hop - 3 * hop - 17  # ragged
    audio = (rng.standard_normal(L) * 0.2).astype(np.float32)
    codes_sharded = sharded.encode_codes(audio)

    t_pad = codes_sharded.shape[0]
    padded = np.pad(audio, (0, t_pad * hop - L))
    ref = codec.module.apply(
        codec.variables, jnp.asarray(padded[None]), method="encode_codes"
    )
    ref = np.asarray(ref)[0].T
    np.testing.assert_array_equal(codes_sharded, ref)
