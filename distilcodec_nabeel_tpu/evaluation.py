"""Quality evaluation: reconstruction + codebook-health metrics.

Provides the README-style evaluation surfaces (reference README.md:62-91):
codebook usage %% and perplexity over a test set, plus reconstruction metrics
(SI-SNR, multi-resolution log-mel L1, STOI, PESQ-like) computed on-device or
natively.  UTMOS requires an external model not present in this image; STOI
is implemented natively (the standard 1/3-octave short-time correlation
definition) and the listening-quality score is the native P.862-structured
``pesq_like`` (see pesq_like.py for the honesty note — same algorithm
structure and MOS-LQO mapping as PESQ, generated psychoacoustic tables).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def si_snr(reference: np.ndarray, estimate: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB (higher is better)."""
    ref = np.asarray(reference, np.float64)
    est = np.asarray(estimate, np.float64)
    n = min(ref.shape[-1], est.shape[-1])
    ref, est = ref[..., :n], est[..., :n]
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    proj = (np.sum(est * ref, -1, keepdims=True) / (np.sum(ref**2, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    return float(
        10 * np.log10((np.sum(proj**2, -1) + eps) / (np.sum(noise**2, -1) + eps))
    )


def mel_l1_multi_res(reference: np.ndarray, estimate: np.ndarray, spec_cfg) -> dict:
    """Multi-resolution log-mel L1 — the reference's validation losses
    (meldataset.py:304-323: n_fft x{1,2,1/2,1/4})."""
    from .dsp.mel import LogMelSpectrogram

    n = min(reference.shape[-1], estimate.shape[-1])
    ref = jnp.asarray(reference[..., :n])[None] if reference.ndim == 1 else jnp.asarray(reference[..., :n])
    est = jnp.asarray(estimate[..., :n])[None] if estimate.ndim == 1 else jnp.asarray(estimate[..., :n])
    out = {}
    for tag, mult in (("x1", 1), ("x2", 2), ("x0.5", 0.5), ("x0.25", 0.25)):
        mel = LogMelSpectrogram(
            sample_rate=spec_cfg.sampling_rate,
            n_fft=int(spec_cfg.n_fft * mult),
            win_length=int(spec_cfg.win_size * mult),
            hop_length=int(spec_cfg.hop_size * mult),
            n_mels=spec_cfg.num_mels,
            f_min=spec_cfg.fmin,
            f_max=spec_cfg.fmax,
        )
        out[f"mel_l1_{tag}"] = float(jnp.mean(jnp.abs(mel(ref) - mel(est))))
    out["mel_l1_total"] = float(sum(out.values()))
    return out


def _thirds_octave_fb(sr: int, n_fft: int, n_bands: int = 15, f_min: float = 150.0):
    """1/3-octave band matrix for STOI."""
    f = np.linspace(0, sr / 2, n_fft // 2 + 1)
    cf = f_min * 2.0 ** (np.arange(n_bands) / 3.0)
    lo = cf * 2 ** (-1 / 6)
    hi = cf * 2 ** (1 / 6)
    fb = np.zeros((n_bands, len(f)))
    for i in range(n_bands):
        fb[i, (f >= lo[i]) & (f < hi[i])] = 1.0
    return fb


def stoi(reference: np.ndarray, estimate: np.ndarray, sr: int = 24000) -> float:
    """Short-Time Objective Intelligibility (classic STOI, no extended mode).

    Standard parameters operate at 10 kHz; inputs are resampled accordingly.
    """
    from .utils.audio_io import resample

    fs = 10000
    n = min(reference.shape[-1], estimate.shape[-1])
    x = resample(np.asarray(reference[..., :n], np.float32), sr, fs).astype(np.float64)
    y = resample(np.asarray(estimate[..., :n], np.float32), sr, fs).astype(np.float64)

    n_fft, hop, win = 512, 128, 256
    window = np.hanning(win + 1)[:win]

    def frames(sig):
        t = 1 + (len(sig) - win) // hop
        idx = np.arange(t)[:, None] * hop + np.arange(win)[None, :]
        return sig[idx] * window

    fx, fy = frames(x), frames(y)
    # remove silent frames (40 dB below loudest, per the STOI definition)
    energy = 20 * np.log10(np.linalg.norm(fx, axis=1) + 1e-12)
    keep = energy > (energy.max() - 40)
    if keep.sum() < 30:
        keep = np.ones_like(keep, bool)
    fx, fy = fx[keep], fy[keep]

    X = np.abs(np.fft.rfft(fx, n_fft, axis=1))
    Y = np.abs(np.fft.rfft(fy, n_fft, axis=1))
    fb = _thirds_octave_fb(fs, n_fft)
    Xb = np.sqrt((fb[None] @ (X**2)[..., None])[..., 0].T + 1e-12)  # (bands, T)
    Yb = np.sqrt((fb[None] @ (Y**2)[..., None])[..., 0].T + 1e-12)

    N = 30  # analysis length (384 ms)
    beta = 10 ** (-15 / 20)
    scores = []
    for m in range(N, Xb.shape[1] + 1):
        Xs = Xb[:, m - N : m]
        Ys = Yb[:, m - N : m]
        alpha = np.sqrt(np.sum(Xs**2, 1, keepdims=True) / (np.sum(Ys**2, 1, keepdims=True) + 1e-12))
        Yc = np.minimum(Ys * alpha, Xs * (1 + beta))
        xn = Xs - Xs.mean(1, keepdims=True)
        yn = Yc - Yc.mean(1, keepdims=True)
        num = np.sum(xn * yn, 1)
        den = np.linalg.norm(xn, axis=1) * np.linalg.norm(yn, axis=1) + 1e-12
        scores.append(num / den)
    return float(np.mean(scores)) if scores else 0.0


def evaluate_codec(
    codec,
    audio_files: list[str],
    max_files: int | None = None,
    enable_bfloat16: bool = True,
) -> dict:
    """Round-trip every file, report reconstruction + codebook metrics —
    the 'batched encode over a test set' evaluation flow (BASELINE config 2
    + README.md:62-91 metrics)."""
    from .utils.audio_io import load_wav

    from .pesq_like import pesq_like

    sr = codec.spec_config.sampling_rate
    K = codec.codec_config.quantizer.codebook_size
    counts = np.zeros(K, np.int64)
    si_snrs, stois, mel_l1s, pesqs = [], [], [], []
    files = audio_files[:max_files] if max_files else audio_files
    for path in files:
        audio, _ = load_wav(path, sr=sr)
        ids = codec.encode_to_token_ids(
            [(audio, sr)], raw_audio=True, plus_offset=False
        )[0]
        np.add.at(counts, np.asarray(ids), 1)
        wave = codec.decode_from_codes(
            ids, minus_token_offset=False, enable_bfloat16=enable_bfloat16
        )[0, 0]
        n = min(len(audio), len(wave))
        si_snrs.append(si_snr(audio[:n], wave[:n]))
        stois.append(stoi(audio[:n], wave[:n], sr))
        pesqs.append(pesq_like(audio[:n], wave[:n], sr))
        mel_l1s.append(
            mel_l1_multi_res(audio[:n], wave[:n], codec.spec_config)["mel_l1_total"]
        )

    p = counts / max(counts.sum(), 1)
    entropy = -np.sum(p[p > 0] * np.log(p[p > 0]))
    return {
        "n_files": len(files),
        "si_snr_mean": float(np.mean(si_snrs)),
        "stoi_mean": float(np.mean(stois)),
        "pesq_like_mean": float(np.mean(pesqs)),
        "mel_l1_total_mean": float(np.mean(mel_l1s)),
        "codebook_usage": float((counts > 0).mean()),
        "codebook_perplexity": float(np.exp(entropy)),
    }
