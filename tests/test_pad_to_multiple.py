"""Serving-shape bucketing (``DistilCodec(pad_to_multiple=...)``).

One-shot serving compiles one program per distinct input length, and a cold
compile through the TPU tunnel costs minutes (DESIGN.md "compile latency") —
the bucketing knob rounds the host-side batch width up to a multiple so a
sweep of lengths hits a handful of programs.  Semantics mirror the
reference's own batch padding (zero right-pad, tokens sliced to the true
``n_hop_len`` — distil_codec.py:119/:566-570; decode pads with code id 0 as
the reference's batch decode does, distil_codec.py:620-630).

Measured contract (asserted here on real audio):
* encode: every token EXCEPT the last <=3 frames is identical to the
  unbucketed encode (the non-causal encoder sees log-mel-of-silence
  right-context inside its receptive-field tail); lengths already on a
  bucket boundary are exactly identical end-to-end;
* decode: the sliced waveform is numerically identical to the unbucketed
  decode at every length tried;
* 20 distinct lengths -> <=4 compiled programs (vs 20 unbucketed).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from test_codec_facade import MINI_CONFIG

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.utils.audio_io import load_wav

ENCODE_TAIL_FRAMES = 3  # measured flip bound (mini config, real audio)


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(MINI_CONFIG)


@pytest.fixture(scope="module")
def real_audio():
    audio, _ = load_wav("/root/reference/data/org_audios/0000.wav", sr=24000)
    return np.asarray(audio, np.float32)


def test_encode_bucketing_token_profile_and_compile_count(codec, real_audio):
    rng = np.random.default_rng(0)
    lengths = sorted(
        rng.choice(np.arange(3000, 9000), size=20, replace=False).tolist()
    )
    enc = codec._jit[False]["encode"]
    base = enc._cache_size()

    codec.pad_to_multiple = 2048
    try:
        bucketed = {
            L: codec.encode_to_token_ids([(real_audio[:L], 24000)], raw_audio=True)[0]
            for L in lengths
        }
        n_bucketed = enc._cache_size() - base
        # 3000..9000-sample widths bucket to {4096, 6144, 8192, 10240}
        assert n_bucketed <= 4, f"bucketing compiled {n_bucketed} programs"
    finally:
        codec.pad_to_multiple = None

    for L in lengths:
        plain = codec.encode_to_token_ids([(real_audio[:L], 24000)], raw_audio=True)[0]
        b = bucketed[L]
        assert len(b) == len(plain)  # n_hop_len bookkeeping unaffected
        flips = [i for i, (x, y) in enumerate(zip(b, plain)) if x != y]
        assert all(i >= len(plain) - ENCODE_TAIL_FRAMES for i in flips), (
            f"L={L}: non-tail token flips at {flips[:10]} of {len(plain)}"
        )
    n_plain = enc._cache_size() - base - n_bucketed
    assert n_plain == len(lengths)  # the hazard being fixed: 1 compile/length


def test_encode_on_bucket_boundary_is_exact(codec, real_audio):
    # width = L + 1 (reference 1-sample left pad) on the boundary: zero
    # extra padding, so bucketed == unbucketed including the tail
    L = 4096 - 1
    codec.pad_to_multiple = 2048
    try:
        b = codec.encode_to_token_ids([(real_audio[:L], 24000)], raw_audio=True)[0]
    finally:
        codec.pad_to_multiple = None
    plain = codec.encode_to_token_ids([(real_audio[:L], 24000)], raw_audio=True)[0]
    assert b == plain


def test_decode_bucketing_exact_and_compile_count(codec):
    rng = np.random.default_rng(0)
    code_lens = sorted(
        rng.choice(np.arange(40, 140), size=20, replace=False).tolist()
    )
    codes = {
        n: (rng.integers(0, 64, size=n) + 1000).tolist() for n in code_lens
    }
    dec = codec._jit[False]["decode_codes"]
    base = dec._cache_size()

    codec.pad_to_multiple = 2048  # hop 64, ds 1 -> 32-frame decode buckets
    try:
        bucketed = {n: codec.decode_from_codes(codes[n]) for n in code_lens}
        n_bucketed = dec._cache_size() - base
        assert n_bucketed <= 4, f"bucketing compiled {n_bucketed} programs"
    finally:
        codec.pad_to_multiple = None

    for n in code_lens:
        plain = codec.decode_from_codes(codes[n])
        assert bucketed[n].shape == plain.shape == (1, 1, n * 64)
        np.testing.assert_allclose(
            bucketed[n][0, 0], plain[0, 0], rtol=0, atol=1e-6
        )
