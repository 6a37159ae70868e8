"""End-to-end facade tests on a miniature config: encode/decode surfaces,
token bookkeeping, checkpoint export/import round-trip."""

import os

import numpy as np
import pytest

from distilcodec_nabeel_tpu import DistilCodec

MINI_CONFIG = {
    "token_id_offset": 1000,
    "spec_transform": {
        "sampling_rate": 24000,
        "segment_size": 4096,
        "num_mels": 32,
        "n_fft": 256,
        "hop_size": 64,
        "win_size": 256,
        "fmin": 0,
        "fmax": 12000,
    },
    "encoder": {
        "input_channels": 32,
        "depths": [1, 1],
        "dims": [32, 48],
        "drop_path_rate": 0.0,
        "kernel_size": 7,
    },
    "decoder": {
        "hop_length": 64,
        "upsample_rates": [4, 4, 2, 2],
        "upsample_kernel_sizes": [8, 8, 4, 4],
        "resblock_kernel_sizes": [3, 7],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
        "num_mels": 48,
        "upsample_initial_channel": 48,
        "use_template": False,
        "pre_conv_kernel_size": 7,
        "post_conv_kernel_size": 7,
    },
    "quantizer": {
        "quantizer_type": "grvq",
        "input_dim": 48,
        "n_groups": 1,
        "n_codebooks": 1,
        "codebook_size": 64,
        "codebook_dim": 56,
        "downsample_factor": [1],
        "ema_decay": 0.8,
        "codebook_diversity_loss_weight": 1.0,
        "codebook_diversity_temperature": 100.0,
    },
}


@pytest.fixture(scope="module")
def codec():
    return DistilCodec(MINI_CONFIG)


def test_encode_token_surface(codec, rng):
    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    result, codes_list, pjt_list, fup_list, gen_lengths, n_hop_lengths = (
        codec.encode([(audio, 24000)], raw_audio=True)
    )
    assert n_hop_lengths == [4096 // 64]
    assert len(codes_list[0]) == 64  # one token per frame (1g x 1r)
    tok = codes_list[0][0]
    assert tok["content"].startswith("<|g0r0_")
    assert 1000 <= tok["absolute_token_id"] < 1000 + 64
    assert pjt_list[0].shape == (128, 28)  # (2L, codebook_dim/2)
    assert fup_list[0].shape == (128, 28)


def test_encode_resample_path(codec, rng):
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    _, codes_list, *_ , nh = codec.encode([(audio, 48000)], raw_audio=True)
    # 8000 samples at 48k -> 4000 at 24k -> 62 frames
    assert nh == [4000 // 64]


def test_decode_from_codes_roundtrip(codec, rng):
    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    ids = codec.encode_to_token_ids([(audio, 24000)], raw_audio=True)[0]
    assert all(i >= 1000 for i in ids)
    wave = codec.decode_from_codes(ids, minus_token_offset=True)
    assert wave.shape == (1, 1, 64 * len(ids))
    assert np.isfinite(wave).all() and np.abs(wave).max() <= 1.0


def test_decode_batch(codec, rng):
    a = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    b = (rng.standard_normal(2048) * 0.1).astype(np.float32)
    ids = codec.encode_to_token_ids(
        [(a, 24000), (b, 24000)], raw_audio=True, plus_offset=False
    )
    ids = [ids[0][:64], ids[1][:32]]
    waves = codec.decode_from_codes_batch(ids, minus_token_offset=False)
    assert len(waves) == 2
    assert waves[0].shape == (1, 1, 64 * 64)
    assert waves[1].shape == (1, 1, 64 * 64)  # padded to batch max
    # single decode of item 0 must equal its batch decode
    single = codec.decode_from_codes(ids[0], minus_token_offset=False)
    np.testing.assert_allclose(
        waves[0][0, 0], single[0, 0], rtol=2e-4, atol=2e-4
    )


def test_checkpoint_roundtrip(codec, rng, tmp_path):
    """Export to the reference torch pickle format, reload via
    from_pretrained, verify identical tokens + waveforms."""
    torch = pytest.importorskip("torch")
    import json

    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    ids_before = codec.encode_to_token_ids(
        [(audio, 24000)], raw_audio=True, plus_offset=False
    )[0]

    cfg_path = tmp_path / "model_config.json"
    cfg_path.write_text(json.dumps(MINI_CONFIG))
    ckpt_path = tmp_path / "g_00000001"
    codec.save_checkpoint(str(ckpt_path))

    codec2 = DistilCodec.from_pretrained(str(cfg_path), str(ckpt_path))
    ids_after = codec2.encode_to_token_ids(
        [(audio, 24000)], raw_audio=True, plus_offset=False
    )[0]
    assert ids_before == ids_after
    w1 = codec.decode_from_codes(ids_before, minus_token_offset=False)
    w2 = codec2.decode_from_codes(ids_after, minus_token_offset=False)
    np.testing.assert_allclose(w1, w2, atol=1e-6)


def test_save_wav(codec, tmp_path, rng):
    batch = rng.standard_normal((2, 1, 1000)).astype(np.float32) * 0.3
    paths = codec.save_wav(
        batch, [800, 1000], save_path=str(tmp_path), audio_names=["a.wav", "b.wav"]
    )
    from distilcodec_nabeel_tpu.utils.audio_io import load_wav

    audio, sr = load_wav(paths[0])
    assert sr == 24000 and audio.shape == (800,)


def test_special_token_quirks(codec):
    spec = codec.gr_audio_code2token["special_audio_tokens"]
    # reference id-skip quirk (distil_codec.py:248-262)
    assert spec[str(1000 + 64 + 5)]["absolute_token_id"] == 1000 + 64 + 7
    assert spec[str(1000 + 64 + 7)]["absolute_token_id"] == 1000 + 64 + 9
    assert spec[str(1000 + 64)]["content"] == "<|beginofaudio|>"


def test_fold_weight_norm_identity(rng):
    """fold_weight_norm: same tokens + waveform, idempotent plain weights."""
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import fold_weight_norm

    codec = DistilCodec(MINI_CONFIG)
    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    _, codes_before, *_ = codec.encode([(audio, 24000)], raw_audio=True)
    ids_before = [t["absolute_token_id"] for t in codes_before[0]]
    wave_before = codec.decode_from_codes(
        ids_before, minus_token_offset=True
    )

    codec.fold_weight_norm()
    _, codes_after, *_ = codec.encode([(audio, 24000)], raw_audio=True)
    ids_after = [t["absolute_token_id"] for t in codes_after[0]]
    assert ids_after == ids_before
    wave_after = codec.decode_from_codes(ids_after, minus_token_offset=True)
    np.testing.assert_allclose(
        np.asarray(wave_after), np.asarray(wave_before), rtol=1e-5, atol=1e-6
    )

    # idempotent: folding twice is exactly stable, g == ||v||
    folded_once = codec.variables["params"]
    folded_twice = fold_weight_norm(folded_once)
    g1 = folded_once["generator"]["ups_0"]["g"]
    v1 = folded_once["generator"]["ups_0"]["v"]
    np.testing.assert_allclose(
        np.asarray(g1),
        np.linalg.norm(np.asarray(v1), axis=(0, 2)),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(folded_twice["generator"]["conv_pre"]["v"]),
        np.asarray(folded_once["generator"]["conv_pre"]["v"]),
        rtol=1e-6,
        atol=1e-7,
    )
