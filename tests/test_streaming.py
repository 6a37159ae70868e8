"""Streaming encoder/decoder == full-sequence processing, chunk by chunk."""

import numpy as np
import pytest

import jax.numpy as jnp

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.streaming import StreamingDecoder, StreamingEncoder
from test_codec_facade import MINI_CONFIG


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(MINI_CONFIG)


@pytest.mark.parametrize("feed_size", [7, 16, 64])
def test_streaming_matches_full_decode(codec, rng, feed_size):
    n = 200
    tokens = rng.integers(0, 64, size=n).astype(int).tolist()
    full = codec.decode_from_codes(tokens, minus_token_offset=False)[0, 0]

    dec = StreamingDecoder(codec, chunk_frames=16, halo_frames=16)
    chunks = []
    for i in range(0, n, feed_size):
        chunks.append(dec.push(tokens[i : i + feed_size]))
    chunks.append(dec.flush())
    streamed = np.concatenate(chunks)

    assert streamed.shape == full.shape
    scale = max(np.abs(full).max(), 1e-12)
    np.testing.assert_allclose(
        streamed, full, rtol=1e-4, atol=1e-4 * scale
    )


def test_streaming_latency_property(codec):
    dec = StreamingDecoder(codec, chunk_frames=16, halo_frames=16)
    assert dec.latency_seconds == pytest.approx(16 * 64 / 24000)


@pytest.mark.parametrize("feed_size", [160, 1024, 100000])
def test_streaming_encoder_matches_full_encode(codec, rng, feed_size):
    hop = MINI_CONFIG["spec_transform"]["hop_size"]
    L = hop * 300 + 17  # non-multiple of hop exercises tail bookkeeping
    audio = (rng.standard_normal(L) * 0.1).astype(np.float32)
    total = L // hop

    full = codec.module.apply(
        codec.variables, jnp.asarray(audio[None]), method="encode_codes"
    )  # (1, G*R, T_mel)
    full = np.asarray(full)[0].T[:total]  # (total, G*R)

    enc = StreamingEncoder(codec, chunk_frames=16)
    got = []
    for i in range(0, L, feed_size):
        got.append(enc.push(audio[i : i + feed_size]))
    got.append(enc.flush())
    streamed = np.concatenate(got, axis=0)

    assert streamed.shape == full.shape
    np.testing.assert_array_equal(streamed, full)


def test_flush_reuses_push_program(codec, rng):
    """For streams >= one window, flush's window has the same shape as every
    push window, so it hits the SAME jit cache entry — no stream-end
    recompile (streaming.py flush docstrings)."""
    hop = MINI_CONFIG["spec_transform"]["hop_size"]

    enc = StreamingEncoder(codec, chunk_frames=16, halo_frames=16)
    L = hop * (enc.window + 40) + 5  # comfortably past one window
    audio = (rng.standard_normal(L) * 0.1).astype(np.float32)
    enc.push(audio)
    n_compiles = enc._encode._cache_size()
    assert n_compiles == 1
    enc.flush()
    assert enc._encode._cache_size() == n_compiles  # flush reused the program

    dec = StreamingDecoder(codec, chunk_frames=16, halo_frames=16)
    tokens = rng.integers(0, 64, size=dec.window + 40).astype(int).tolist()
    dec.push(tokens)
    n_compiles = dec._decode._cache_size()
    assert n_compiles == 1
    dec.flush()
    assert dec._decode._cache_size() == n_compiles


def test_streaming_encoder_roundtrip_with_decoder(codec, rng):
    """Mic -> StreamingEncoder -> StreamingDecoder pipeline is coherent."""
    hop = MINI_CONFIG["spec_transform"]["hop_size"]
    L = hop * 128
    audio = (rng.standard_normal(L) * 0.1).astype(np.float32)
    enc = StreamingEncoder(codec, chunk_frames=16, halo_frames=16)
    dec = StreamingDecoder(codec, chunk_frames=16, halo_frames=16)
    wave = []
    for i in range(0, L, 4096):
        codes = enc.push(audio[i : i + 4096])
        if codes.size:
            wave.append(dec.push(codes[:, 0].tolist()))
    codes = enc.flush()
    if codes.size:
        wave.append(dec.push(codes[:, 0].tolist()))
    wave.append(dec.flush())
    out = np.concatenate(wave)
    assert out.shape == (L,)
    assert np.isfinite(out).all()
