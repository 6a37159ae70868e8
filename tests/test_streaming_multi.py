"""Multi-stream (synchronized batch) streaming: N streams per dispatch.

``StreamingEncoder/StreamingDecoder(n_streams=N)`` must produce, for every
stream, exactly what N independent single-stream instances produce (the
batch axis is row-independent everywhere in the model)."""

import numpy as np
import pytest

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.streaming import StreamingDecoder, StreamingEncoder

from test_codec_facade import MINI_CONFIG


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(MINI_CONFIG)


def test_multi_stream_encode_matches_single(codec, rng):
    N, seconds = 3, 1.2
    sr = codec.spec_config.sampling_rate
    n = int(seconds * sr)
    audio = (rng.standard_normal((N, n)) * 0.1).astype(np.float32)

    multi = StreamingEncoder(codec, chunk_frames=8, n_streams=N)
    singles = [StreamingEncoder(codec, chunk_frames=8) for _ in range(N)]

    block = 8 * codec.hop_size * codec.ds_factor
    outs_m, outs_s = [], [[] for _ in range(N)]
    for pos in range(0, n, block):
        cm = multi.push(audio[:, pos : pos + block])
        if cm.shape[1]:
            outs_m.append(cm)
        for i, s in enumerate(singles):
            cs = s.push(audio[i, pos : pos + block])
            if len(cs):
                outs_s[i].append(cs)
    tail_m = multi.flush()
    if tail_m.shape[1]:
        outs_m.append(tail_m)
    for i, s in enumerate(singles):
        t = s.flush()
        if len(t):
            outs_s[i].append(t)

    m = np.concatenate(outs_m, axis=1)  # (N, T, GR)
    for i in range(N):
        si = np.concatenate(outs_s[i], axis=0)  # (T, GR)
        np.testing.assert_array_equal(m[i], si)


def test_multi_stream_decode_matches_single(codec, rng):
    N = 3
    frames = 40
    K = codec.codec_config.quantizer.codebook_size
    gr = codec.ngroups * codec.nresiduals
    codes = rng.integers(0, K, size=(N, frames, gr))

    multi = StreamingDecoder(codec, chunk_frames=8, n_streams=N)
    singles = [StreamingDecoder(codec, chunk_frames=8) for _ in range(N)]

    outs_m, outs_s = [], [[] for _ in range(N)]
    for pos in range(0, frames, 8):
        wm = multi.push(codes[:, pos : pos + 8])
        if wm.shape[1]:
            outs_m.append(wm)
        for i, s in enumerate(singles):
            ws = s.push(codes[i, pos : pos + 8])
            if len(ws):
                outs_s[i].append(ws)
    tail = multi.flush()
    if tail.shape[1]:
        outs_m.append(tail)
    for i, s in enumerate(singles):
        t = s.flush()
        if len(t):
            outs_s[i].append(t)

    m = np.concatenate(outs_m, axis=1)  # (N, samples)
    for i in range(N):
        si = np.concatenate(outs_s[i])
        assert m[i].shape == si.shape
        np.testing.assert_allclose(m[i], si, atol=1e-6)
