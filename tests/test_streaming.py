"""Streaming decoder == full-sequence decode, chunk by chunk."""

import numpy as np
import pytest

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.streaming import StreamingDecoder
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
