"""Teacher-mode (downsample_factor product 2) streaming + time sharding.

The paper's teacher codec downsamples the latent 2x before VQ
(reference grfvq.py:68-96; README.md:56-59), so one code frame covers
2 mel frames = 2*hop samples.  StreamingEncoder/StreamingDecoder and
TimeShardedCodec must reproduce full-sequence processing exactly with
p-aligned windows (strided-conv phase preservation).
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.parallel.halo import HaloConfig, TimeShardedCodec
from distilcodec_nabeel_tpu.streaming import StreamingDecoder, StreamingEncoder
from test_codec_facade import MINI_CONFIG

TEACHER_MINI = copy.deepcopy(MINI_CONFIG)
TEACHER_MINI["quantizer"].update(
    n_groups=2, n_codebooks=2, downsample_factor=[2]
)


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(TEACHER_MINI)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("time",))


def test_ds2_shapes(codec, rng):
    hop = TEACHER_MINI["spec_transform"]["hop_size"]
    audio = (rng.standard_normal(hop * 64) * 0.1).astype(np.float32)
    codes = codec.module.apply(
        codec.variables, jnp.asarray(audio[None]), method="encode_codes"
    )
    assert codes.shape == (1, 4, 32)  # G*R=4 codes at half the mel rate


@pytest.mark.parametrize("feed_size", [160, 4096, 100000])
def test_ds2_streaming_encoder_matches_full(codec, rng, feed_size):
    hop = TEACHER_MINI["spec_transform"]["hop_size"]
    L = hop * 2 * 150 + hop + 17  # ragged: not a multiple of hop*p
    audio = (rng.standard_normal(L) * 0.1).astype(np.float32)
    total = L // (hop * 2)

    full = codec.module.apply(
        codec.variables, jnp.asarray(audio[None]), method="encode_codes"
    )  # (1, G*R, T_codes)
    full = np.asarray(full)[0].T[:total]

    enc = StreamingEncoder(codec, chunk_frames=16)
    got = []
    for i in range(0, L, feed_size):
        got.append(enc.push(audio[i : i + feed_size]))
    got.append(enc.flush())
    streamed = np.concatenate(got, axis=0)

    assert streamed.shape == full.shape
    np.testing.assert_array_equal(streamed, full)


def test_ds2_streaming_decoder_matches_full(codec, rng):
    n = 150
    K = TEACHER_MINI["quantizer"]["codebook_size"]
    frames = rng.integers(0, K, size=(n, 4), dtype=np.int32)  # (T, G*R)

    ind = frames.reshape(n, 2, 2)
    ind = jnp.asarray(np.transpose(ind, (1, 0, 2))[:, None])  # (G, 1, T, R)
    full = np.asarray(
        codec.module.apply(codec.variables, ind, method="decode_codes")
    )[0]

    dec = StreamingDecoder(codec, chunk_frames=16, halo_frames=16)
    chunks = []
    for i in range(0, n, 13):
        chunks.append(dec.push(frames[i : i + 13]))
    chunks.append(dec.flush())
    streamed = np.concatenate(chunks)

    assert streamed.shape == full.shape
    scale = max(np.abs(full).max(), 1e-12)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-4 * scale)


def test_short_stream_flush_matches_full(rng):
    """Streams shorter than one window: flush must end the computation at the
    true stream boundary (variable-length window), not zero-pad samples past
    it — zero samples make non-zero log-mel frames and would corrupt the
    trailing codes."""
    codec = DistilCodec(MINI_CONFIG)
    hop = MINI_CONFIG["spec_transform"]["hop_size"]
    L = hop * 20  # 20 frames << window (16 + 2*halo)
    audio = (rng.standard_normal(L) * 0.1).astype(np.float32)

    full = codec.module.apply(
        codec.variables, jnp.asarray(audio[None]), method="encode_codes"
    )
    full = np.asarray(full)[0].T[: L // hop]

    enc = StreamingEncoder(codec, chunk_frames=16)
    got = [enc.push(audio), enc.flush()]
    streamed = np.concatenate(got, axis=0)
    assert streamed.shape == full.shape
    np.testing.assert_array_equal(streamed, full)


def test_ds2_sharded_encode_matches_unsharded(codec, mesh, rng):
    sharded = TimeShardedCodec(
        codec.module,
        codec.variables,
        mesh,
        halo=HaloConfig(encoder_halo_frames=12, decoder_halo_frames=12),
    )
    hop = TEACHER_MINI["spec_transform"]["hop_size"]
    L = 8 * 30 * 2 * hop - 3 * hop - 17  # ragged
    audio = (rng.standard_normal(L) * 0.2).astype(np.float32)
    codes_sharded = sharded.encode_codes(audio)  # (T_pad, G*R)

    t_pad = codes_sharded.shape[0]
    padded = np.pad(audio, (0, t_pad * 2 * hop - L))
    ref = codec.module.apply(
        codec.variables, jnp.asarray(padded[None]), method="encode_codes"
    )
    ref = np.asarray(ref)[0].T
    assert codes_sharded.shape == ref.shape
    mismatch = (codes_sharded != ref).sum()
    assert mismatch == 0, f"{mismatch}/{ref.size} code mismatches"


def test_ds2_sharded_decode_matches_unsharded(codec, mesh, rng):
    import jax.tree_util as jtu

    variables = jtu.tree_map(lambda x: x, codec.variables)
    grvq = variables["codebook"]["quantizer"]["grvq"]
    for g in range(2):
        for r in range(2):
            layer = grvq[f"rvqs_{g}"][f"layers_{r}"]
            layer["embed"] = layer["embed"] * 1e5

    sharded = TimeShardedCodec(
        codec.module,
        variables,
        mesh,
        halo=HaloConfig(encoder_halo_frames=12, decoder_halo_frames=12),
    )
    n_frames = 8 * 30
    K = TEACHER_MINI["quantizer"]["codebook_size"]
    codes = rng.integers(0, K, size=(n_frames, 4), dtype=np.int32)

    wave_sharded = sharded.decode_codes(codes)

    # unsharded: (T, G*R) -> reference layout (G, 1, T, R)
    ind = codes.reshape(n_frames, 2, 2)
    ind = jnp.asarray(np.transpose(ind, (1, 0, 2))[:, None])
    ref = np.asarray(
        codec.module.apply(variables, ind, method="decode_codes")
    )[0]
    assert wave_sharded.shape == ref.shape
    scale = np.abs(ref).max()
    assert scale > 1e-4
    np.testing.assert_allclose(wave_sharded, ref, rtol=1e-5, atol=1e-5 * scale)
