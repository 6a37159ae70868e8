"""Dataset pipeline + short training-loop integration test on synthetic wavs."""

import json
import os

import numpy as np
import pytest

from distilcodec_nabeel_tpu.config import CodecConfig, TrainConfig
from distilcodec_nabeel_tpu.training.dataset import (
    AudioCropDataset,
    PrefetchLoader,
    get_dataset_filelist,
    get_training_files,
    get_validation_files,
)
from distilcodec_nabeel_tpu.utils.audio_io import save_wav
from test_codec_facade import MINI_CONFIG
from test_training import mini_codec_cfg, mini_train_cfg


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for sub, n in (("stage1", 6), ("stage2", 4)):
        os.makedirs(d / sub, exist_ok=True)
        for i in range(n):
            audio = rng.standard_normal(3000 + 500 * i).astype(np.float32) * 0.2
            save_wav(str(d / sub / f"clip{i}.wav"), audio, 24000)
    return d


def test_filelist_replay_mixture(wav_dir):
    cfg = {
        "training_files_path": {
            "replay_training_file_pathes": [
                {"path": str(wav_dir / "stage1"), "replay_rate": 0.5}
            ],
            "current_training_file_pathes": [str(wav_dir / "stage2")],
        },
        "validation_files_path": [str(wav_dir / "stage1"), str(wav_dir / "stage2")],
    }
    train, val = get_dataset_filelist(cfg)
    assert len(train) == 3 + 4  # 50% of 6 replayed + all 4 current
    assert len(val) == 10
    # interleaved validation: first two from different dirs
    assert "stage1" in val[0] and "stage2" in val[1]


def test_crop_dataset_and_loader(wav_dir):
    files = [str(wav_dir / "stage1" / f"clip{i}.wav") for i in range(6)]
    ds = AudioCropDataset(files, segment_size=2048, sampling_rate=24000)
    item = ds[0]
    assert item.shape == (2048,) and item.dtype == np.float32
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b.shape == (2, 2048) for b in batches)


def test_noise_fallback(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    ds = AudioCropDataset([str(bad)], segment_size=1024, sampling_rate=24000)
    item = ds[0]
    assert item.shape == (1024,) and np.abs(item).max() < 1.0


def test_short_training_loop(wav_dir, tmp_path):
    """Two real optimizer steps end-to-end through run_training, with
    checkpoint write + reference-format export."""
    from distilcodec_nabeel_tpu.training.loop import run_training

    codec_cfg = mini_codec_cfg()
    # shrink segment for speed
    spec = dict(MINI_CONFIG["spec_transform"])
    raw = dict(codec_cfg.raw or MINI_CONFIG)
    import dataclasses

    codec_cfg = dataclasses.replace(
        codec_cfg, spec=dataclasses.replace(codec_cfg.spec, segment_size=2048)
    )
    tcfg = mini_train_cfg()
    tcfg = dataclasses.replace(
        tcfg,
        save_path=str(tmp_path / "ckpt"),
        checkpoint_interval=2,
        summary_interval=1,
        stdout_interval=1,
        validation_interval=2,
        training_epochs=1,
    )
    files = [str(wav_dir / "stage1" / f"clip{i}.wav") for i in range(6)]
    state = run_training(
        codec_cfg,
        tcfg,
        training_files=files,
        validation_files=files[:2],
        max_steps=2,
        use_mesh=False,
        log_dir=str(tmp_path / "logs"),
    )
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "ckpt" / "g_00000002")
    assert os.path.exists(tmp_path / "ckpt" / "state_00000002")


def test_run_validation_streams_full_list(wav_dir):
    """Production-scale validation (VERDICT r1 item 6): the full file list
    streams through ONE compiled eval shape (wrap-padded final batch), and
    the metrics cover every file — not a 4-batch cap."""
    import jax

    from distilcodec_nabeel_tpu.training.loop import run_validation
    from distilcodec_nabeel_tpu.training.train import Trainer

    import dataclasses

    codec_cfg = mini_codec_cfg()
    codec_cfg = dataclasses.replace(
        codec_cfg, spec=dataclasses.replace(codec_cfg.spec, segment_size=2048)
    )
    trainer = Trainer(codec_cfg, mini_train_cfg(), steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0), segment_len=2048)

    # 10 files, batch 4 -> wrap-pads to 12 = 3 full batches, one shape
    files = [
        str(wav_dir / sub / f"clip{i}.wav")
        for sub, n in (("stage1", 6), ("stage2", 4))
        for i in range(n)
    ]
    eval_fn = jax.jit(trainer.eval_step)
    metrics = run_validation(
        trainer, state, files, batch_size=4, eval_fn=eval_fn
    )
    assert metrics["val/num_files"] == 10
    assert np.isfinite(metrics["val/mel_l1_total"])
    assert 0 <= metrics["val/codebook_usage"] <= 1
    assert eval_fn._cache_size() == 1  # single compiled shape, no recompiles

    # empty list degrades cleanly
    assert run_validation(trainer, state, [], batch_size=4) == {}


def test_shard_files_disjoint_and_complete():
    from distilcodec_nabeel_tpu.training.dataset import shard_files

    files = [f"f{i}.wav" for i in range(10)]
    shards = [shard_files(files, host_id=h, n_hosts=3) for h in range(3)]
    # disjoint, complete, round-robin (replay-mixture order preserved)
    assert sorted(sum(shards, [])) == sorted(files)
    assert len(set(sum(shards, []))) == 10
    assert shards[0] == ["f0.wav", "f3.wav", "f6.wav", "f9.wav"]
    # single host: identity
    assert shard_files(files, host_id=0, n_hosts=1) == files


def test_graceful_shutdown_checkpoints(wav_dir, tmp_path):
    """SIGTERM mid-training: the loop finishes the in-flight step, writes a
    resume checkpoint at the exact stopping step, and returns cleanly
    (preemption-safe behavior the reference lacks, SURVEY §5.3)."""
    import dataclasses
    import os as _os
    import signal
    import threading

    from distilcodec_nabeel_tpu.training.loop import run_training

    codec_cfg = mini_codec_cfg()
    codec_cfg = dataclasses.replace(
        codec_cfg, spec=dataclasses.replace(codec_cfg.spec, segment_size=2048)
    )
    tcfg = mini_train_cfg()
    tcfg = dataclasses.replace(
        tcfg,
        save_path=str(tmp_path / "ckpt"),
        checkpoint_interval=1000,  # never hit: only the shutdown save fires
        summary_interval=1000,
        stdout_interval=1000,
        validation_interval=1000,
        training_epochs=1000,
    )
    files = [str(wav_dir / "stage1" / f"clip{i}.wav") for i in range(6)]

    # a benign handler in case the timer fires before run_training installs
    # its own (e.g. during the first compile)
    prev = signal.signal(signal.SIGTERM, lambda *_: None)
    stop = threading.Event()

    def keep_signaling():
        while not stop.wait(1.0):
            _os.kill(_os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=keep_signaling, daemon=True)
    t.start()
    try:
        state = run_training(
            codec_cfg,
            tcfg,
            training_files=files,
            validation_files=[],
            use_mesh=False,
            log_dir=str(tmp_path / "logs"),
        )
    finally:
        stop.set()
        t.join()
        signal.signal(signal.SIGTERM, prev)

    step = int(state.step)
    assert 1 <= step < 100  # stopped early, not by epochs running out
    assert _os.path.exists(tmp_path / "ckpt" / f"state_{step:08d}")


def test_deterministic_resume_record_level(wav_dir):
    """Record-level deterministic resume (SURVEY §7.7 grain-grade property):
    a loader fast-forwarded to (epoch, batch) yields bit-identical batches to
    the uninterrupted stream from that point — crops included — for both the
    Python and native loaders."""
    from distilcodec_nabeel_tpu.training.dataset import make_loader

    files = [
        str(wav_dir / sub / f"clip{i}.wav")
        for sub, n in (("stage1", 6), ("stage2", 4))
        for i in range(n)
    ]

    def collect(loader, n):
        out = []
        while len(out) < n:
            for b in loader:
                out.append(b)
                if len(out) >= n:
                    break
        return out

    loader_a = make_loader(files, batch_size=2, segment_size=1024,
                           sampling_rate=24000, num_workers=2, seed=7)
    full = collect(loader_a, 12)  # 5 batches/epoch -> spans 3 epochs

    loader_b = make_loader(files, batch_size=2, segment_size=1024,
                           sampling_rate=24000, num_workers=2, seed=7)
    assert loader_b.state == {"epoch": 0, "batch": 0}
    loader_b.set_state(1, 2)  # resume mid-epoch-1 = stream position 7
    resumed = collect(loader_b, 5)
    for a, b in zip(full[7:], resumed):
        np.testing.assert_array_equal(a, b)

    # pure-function crops: same (epoch, index) -> same crop, twice
    from distilcodec_nabeel_tpu.training.dataset import AudioCropDataset

    ds = AudioCropDataset(files, segment_size=1024, sampling_rate=24000,
                          seed=7, n_cache_reuse=0)
    ds.set_epoch(3)
    a1, a2 = ds[4], ds[4]
    np.testing.assert_array_equal(a1, a2)
    ds.set_epoch(4)  # different epoch -> (almost surely) different crop
    assert not np.array_equal(ds[4], a1)
