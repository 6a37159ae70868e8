"""Native C++ data-loader core (native/dc_io.cpp) vs the scipy path.

The native library re-implements WAV decode (scipy.io.wavfile semantics),
polyphase resampling (scipy.signal.resample_poly's exact filter), random
crops with zero-pad, and the corrupted-file noise fallback
(reference: distilcodec/models/meldataset.py:18-20, :227-268).
"""

import os
import numpy as np
import pytest

from distilcodec_nabeel_tpu import native
from distilcodec_nabeel_tpu.utils import audio_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native lib"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _write_wav(path, data, sr, dtype):
    from scipy.io import wavfile

    if dtype == np.int16:
        pcm = np.clip(data * 32768.0, -32768, 32767).astype(np.int16)
    elif dtype == np.int32:
        pcm = np.clip(data * 2147483648.0, -(2**31), 2**31 - 1).astype(np.int32)
    elif dtype == np.float32:
        pcm = data.astype(np.float32)
    else:
        raise AssertionError(dtype)
    wavfile.write(str(path), sr, pcm)


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.float32])
def test_decode_matches_scipy(tmp_path, rng, dtype):
    data = (rng.standard_normal(4321) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_wav(p, data, 24000, dtype)
    ref, ref_sr = audio_io.load_wav(str(p))
    got, got_sr = native.load_wav(str(p))
    assert got_sr == ref_sr == 24000
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_decode_stereo_mono_mean(tmp_path, rng):
    data = (rng.standard_normal((1000, 2)) * 0.3).astype(np.float32)
    p = tmp_path / "st.wav"
    _write_wav(p, data, 16000, np.int16)
    ref, _ = audio_io.load_wav(str(p))
    got, _ = native.load_wav(str(p))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("orig_sr", [48000, 22050, 16000])
def test_resample_matches_resample_poly(tmp_path, rng, orig_sr):
    data = (rng.standard_normal(orig_sr // 2) * 0.3).astype(np.float32)
    p = tmp_path / "r.wav"
    _write_wav(p, data, orig_sr, np.float32)
    ref, _ = audio_io.load_wav(str(p), sr=24000)
    got, got_sr = native.load_wav(str(p), sr=24000)
    assert got_sr == 24000
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_batch_crops_shapes_padding_and_determinism(tmp_path, rng):
    paths = []
    lens = [5000, 1000, 3000]  # middle one shorter than segment -> zero-pad
    for i, n in enumerate(lens):
        p = tmp_path / f"c{i}.wav"
        _write_wav(p, (rng.standard_normal(n) * 0.3).astype(np.float32), 24000,
                   np.int16)
        paths.append(str(p))
    out1, ok1 = native.batch_crops(paths, segment=2048, sr=24000, seed=7)
    out2, ok2 = native.batch_crops(paths, segment=2048, sr=24000, seed=7)
    assert out1.shape == (3, 2048) and out1.dtype == np.float32
    assert ok1 == ok2 == 3
    np.testing.assert_array_equal(out1, out2)  # deterministic in seed
    # short clip: first 1000 samples are the full file, rest zeros
    full, _ = native.load_wav(paths[1])
    np.testing.assert_allclose(out1[1, :1000], full, atol=1e-7)
    assert (out1[1, 1000:] == 0).all()
    # crop rows must be contiguous slices of their source files
    full0, _ = native.load_wav(paths[0])
    w = out1[0]
    found = any(
        np.allclose(full0[s : s + 2048], w, atol=1e-7)
        for s in range(0, 5000 - 2048 + 1)
    )
    assert found


def test_batch_crops_corrupt_fallback(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    out, ok = native.batch_crops([str(bad)], segment=4096, sr=24000, seed=3)
    assert ok == 0
    # noise fallback: nonzero, low amplitude (N(0,1)*0.05 over 1 s, cropped)
    assert np.abs(out).max() > 0
    assert out.std() == pytest.approx(0.05, rel=0.1)


def test_save_wav_roundtrip(tmp_path, rng):
    data = (rng.standard_normal(2000) * 0.5).astype(np.float32)
    p1, p2 = tmp_path / "n.wav", tmp_path / "s.wav"
    native.save_wav(str(p1), data, 24000)
    audio_io.save_wav(str(p2), data, 24000)
    a, sr_a = audio_io.load_wav(str(p1))
    b, sr_b = audio_io.load_wav(str(p2))
    assert sr_a == sr_b == 24000
    np.testing.assert_array_equal(a, b)


REF_MP3 = "/root/reference/test.mp3"


@pytest.mark.skipif(
    not (native.available() and native.has_ffmpeg() and os.path.exists(REF_MP3)),
    reason="no ffmpeg libav / reference mp3",
)
def test_mp3_decode_via_libav():
    a, sr = native.load_wav(REF_MP3)
    assert sr in (44100, 48000, 24000) and a.ndim == 1 and len(a) > 10000
    assert 0.001 < np.abs(a).max() <= 1.5  # real audio, sane scale
    # resampled load through the shared scipy-exact polyphase path
    b, sr24 = audio_io.load_wav(REF_MP3, sr=24000)
    assert sr24 == 24000
    assert abs(len(b) - len(a) * 24000 / sr) <= 1
    # batch_crops accepts mp3 directly
    out, ok = native.batch_crops([REF_MP3], segment=8192, sr=24000, seed=5)
    assert ok == 1 and out.shape == (1, 8192)
    # the crop is a contiguous slice of the resampled stream
    hits = np.flatnonzero(np.isclose(b[: -8191 or None], out[0, 0], atol=1e-7))
    assert any(
        np.allclose(b[s : s + 8192], out[0], atol=1e-7)
        for s in hits
        if s + 8192 <= len(b)
    )


def test_missing_file_raises():
    with pytest.raises(OSError):
        native.load_wav("/nonexistent/nope.wav")


def test_native_loader_yields_batches(tmp_path, rng):
    from distilcodec_nabeel_tpu.training.dataset import (
        NativeCropLoader,
        make_loader,
    )

    paths = []
    for i in range(5):
        p = tmp_path / f"d{i}.wav"
        _write_wav(p, (rng.standard_normal(4000) * 0.3).astype(np.float32),
                   24000, np.int16)
        paths.append(str(p))
    loader = make_loader(paths, batch_size=2, segment_size=2048,
                         sampling_rate=24000, seed=1)
    assert isinstance(loader, NativeCropLoader)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # drop_last
    for b in batches:
        assert b.shape == (2, 2048) and b.dtype == np.float32
    # second epoch reshuffles but still yields well-formed batches
    assert len(list(loader)) == 2
