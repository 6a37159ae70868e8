"""Evaluation metric sanity: SI-SNR/STOI behave correctly on known signals;
evaluate_codec runs end-to-end on the mini codec."""

import numpy as np
import pytest

from distilcodec_nabeel_tpu.evaluation import (
    evaluate_codec,
    mel_l1_multi_res,
    si_snr,
    stoi,
)
from distilcodec_nabeel_tpu.pesq_like import pesq_like
from test_codec_facade import MINI_CONFIG


def test_si_snr_properties(rng):
    x = rng.standard_normal(24000).astype(np.float32)
    assert si_snr(x, x) > 60  # identical => huge SNR
    assert si_snr(x, 0.5 * x) > 60  # scale-invariant
    noisy = x + 0.1 * rng.standard_normal(24000).astype(np.float32)
    s = si_snr(x, noisy)
    assert 15 < s < 25  # ~20 dB for 0.1 noise
    assert si_snr(x, rng.standard_normal(24000).astype(np.float32)) < 1


def test_stoi_properties(rng):
    # broadband modulated noise ~ speech-shaped (pure tones leave most
    # 1/3-octave bands empty, which is out of STOI's domain)
    t = np.arange(48000) / 24000
    x = (
        rng.standard_normal(48000) * (1 + 0.8 * np.sin(2 * np.pi * 4 * t))
    ).astype(np.float32)
    assert stoi(x, x, 24000) > 0.95
    noise = rng.standard_normal(48000).astype(np.float32)
    # uncorrelated noise scores well below identity (the clip step gives
    # STOI a floor for equal-energy noise; ordering is what matters)
    assert stoi(x, noise, 24000) < 0.85
    assert stoi(x, x + 0.2 * noise, 24000) > stoi(x, x + 2.0 * noise, 24000)
    assert stoi(x, x + 0.2 * noise, 24000) > stoi(x, noise, 24000)


def test_pesq_like_properties(rng):
    # speech-shaped test signal: amplitude-modulated broadband noise,
    # band-limited-ish by the receive filter inside the metric
    t = np.arange(72000) / 24000
    x = (
        rng.standard_normal(72000) * (1 + 0.8 * np.sin(2 * np.pi * 4 * t))
    ).astype(np.float32) * 0.3

    clean = pesq_like(x, x, 24000)
    assert clean > 4.0  # identity ~ max MOS-LQO
    assert pesq_like(x, 0.5 * x, 24000) > 3.8  # near-gain-invariant

    noise = rng.standard_normal(72000).astype(np.float32) * 0.3
    light = pesq_like(x, x + 0.05 * noise, 24000)
    heavy = pesq_like(x, x + 0.5 * noise, 24000)
    uncorr = pesq_like(x, noise, 24000)
    assert clean >= light > heavy > uncorr  # monotone in degradation
    assert 0.9 < uncorr < 3.0  # bounded, clearly "bad"
    # narrowband mode runs and stays in range
    nb = pesq_like(x, x + 0.2 * noise, 24000, mode="nb")
    assert 0.9 < nb < 4.7


def test_pesq_like_delay_alignment(rng):
    t = np.arange(48000) / 24000
    x = (
        rng.standard_normal(48000) * (1 + 0.8 * np.sin(2 * np.pi * 4 * t))
    ).astype(np.float32) * 0.3
    delayed = np.concatenate([np.zeros(480, np.float32), x])[:48000]
    # 20 ms constant delay must be absorbed by the aligner
    assert pesq_like(x, delayed, 24000) > 3.5


def test_mel_l1_multi_res(rng):
    from distilcodec_nabeel_tpu.config import SpecConfig

    x = rng.standard_normal(24000).astype(np.float32) * 0.3
    out = mel_l1_multi_res(x, x, SpecConfig())
    assert out["mel_l1_total"] < 1e-5
    y = rng.standard_normal(24000).astype(np.float32) * 0.3
    assert mel_l1_multi_res(x, y, SpecConfig())["mel_l1_total"] > 0.5


def test_evaluate_codec_end_to_end(rng, tmp_path):
    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.utils.audio_io import save_wav

    codec = DistilCodec(MINI_CONFIG)
    files = []
    for i in range(2):
        p = tmp_path / f"c{i}.wav"
        save_wav(str(p), rng.standard_normal(4096).astype(np.float32) * 0.2, 24000)
        files.append(str(p))
    metrics = evaluate_codec(codec, files, enable_bfloat16=False)
    assert metrics["n_files"] == 2
    assert 0 <= metrics["codebook_usage"] <= 1
    assert metrics["codebook_perplexity"] >= 1
    assert np.isfinite(metrics["si_snr_mean"])
    assert 0 <= metrics["stoi_mean"] <= 1
