"""Resampler-choice sensitivity bound (VERDICT r2 item 5).

The reference preprocesses non-24 kHz audio through librosa's resampler
(soxr-HQ / kaiser_best family, distil_codec.py:657-684); our pipeline uses
scipy ``resample_poly`` (Kaiser beta=5 design).  soxr itself is unreachable
offline, so this test bounds the hole empirically: it encodes REAL audio
(the reference repo's own universal-audio set) downsampled from 44.1 kHz by
BOTH designs — the pipeline polyphase filter and a librosa/resampy
``kaiser_best``-class sinc (64 zero-crossings, beta 14.7697, rolloff 0.9475,
the same family soxr-HQ belongs to) — through the full-size flagship encoder
and asserts the token-id flip rate between them stays tiny.  Measured
2026-08-21 (seeded random flagship weights, 2 clips x 3 s, 562 tokens):
0 flips.  The bound is set at 1% to keep the test robust to future
weight-init changes while still catching a real resampler-sensitivity
regression (a broken filter flips >50% of tokens)."""

import numpy as np

from distilcodec_nabeel_tpu.utils.audio_io import load_wav, resample

ORG_DIR = "/root/reference/data/org_audios"
CLIPS = ("0006.wav", "0002.wav")
SR = 24000
CROP = 3 * SR  # 3 s at 24 kHz


def _flagship_codec():
    import json

    from distilcodec_nabeel_tpu import DistilCodec

    with open("/root/reference/configs/model_config.json") as f:
        cfg = json.load(f)
    return DistilCodec(cfg, seed=0)


def _tokens(codec, audio: np.ndarray):
    _, codes, *_ = codec.encode([(audio, SR)], raw_audio=True)
    return [t["in_codebook_id"] for t in codes[0]]


def test_kaiser_best_filter_is_high_quality():
    """The kaiser_best-class design passes the audio band essentially
    unchanged and agrees with the polyphase design to ~-57 dB on in-band
    content (both are linear-phase, delay-compensated)."""
    t = np.arange(44100 * 2) / 44100
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    ya = resample(x, 44100, 24000, "poly")
    yb = resample(x, 44100, 24000, "kaiser_best")
    n = min(len(ya), len(yb))
    d = ya[4000 : n - 4000] - yb[4000 : n - 4000]
    sig = ya[4000 : n - 4000]
    rel = np.sqrt((d**2).mean()) / np.sqrt((sig**2).mean())
    assert rel < 5e-3, rel
    # unity DC gain (resample_poly window-array scaling contract)
    dc = resample(np.ones(44100, np.float32), 44100, 24000, "kaiser_best")
    np.testing.assert_allclose(dc[4000:-4000], 1.0, atol=1e-6)


def test_token_flip_rate_between_resampler_designs():
    """Full flagship encode of real audio resampled 44.1k->24k by the two
    designs: token ids must agree (<=1% flips; measured 0)."""
    from scipy.signal import resample as fft_resample

    codec = _flagship_codec()
    total = flips = 0
    for name in CLIPS:
        y, sr = load_wav(f"{ORG_DIR}/{name}")
        assert sr == SR
        y = y[SR : SR + CROP]  # skip the first second (often near-silence)
        # synthesize the 44.1 kHz "source" with a THIRD, neutral method
        # (FFT resampling) so neither candidate filter is favored
        y44 = fft_resample(y, int(len(y) * 44100 / SR)).astype(np.float32)
        a = resample(y44, 44100, SR, "poly")
        b = resample(y44, 44100, SR, "kaiser_best")
        n = min(len(a), len(b))
        ta = _tokens(codec, a[:n])
        tb = _tokens(codec, b[:n])
        assert len(ta) == len(tb)
        total += len(ta)
        flips += sum(x != y for x, y in zip(ta, tb))
    assert total >= 500, total
    rate = flips / total
    assert rate <= 0.01, (flips, total, rate)
