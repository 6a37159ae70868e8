"""Checkpoint/resume: orbax train-state round trip restores everything
(params, EMA codebook, both optimizers, spectral-norm state, step)."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.utils import checkpoint as ckpt_utils
from test_training import mini_codec_cfg, mini_train_cfg


def test_train_state_save_restore(tmp_path, rng):
    from distilcodec_nabeel_tpu.training.train import Trainer

    trainer = Trainer(mini_codec_cfg(), mini_train_cfg(), steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0), segment_len=2048)
    audio = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)
    step = jax.jit(trainer.train_step)
    state, _ = step(state, audio, jax.random.PRNGKey(1))
    state, _ = step(state, audio, jax.random.PRNGKey(2))

    path = ckpt_utils.save_train_state(str(tmp_path), int(state.step), state)
    assert os.path.exists(path)

    template = trainer.init_state(jax.random.PRNGKey(7), segment_len=2048)
    restored = ckpt_utils.restore_train_state(str(tmp_path), template)
    assert restored is not None
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_params),
        jax.tree_util.tree_leaves(restored.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.codebook),
        jax.tree_util.tree_leaves(restored.codebook),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues identically from the restored state
    s1, m1 = step(state, audio, jax.random.PRNGKey(3))
    s2, m2 = step(restored, audio, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(m1["g_loss/total"]), float(m2["g_loss/total"]), rtol=1e-6
    )


def test_scan_checkpoint_semantics(tmp_path):
    for step in (100, 204000, 5):
        (tmp_path / f"g_{step:08d}").write_bytes(b"x")
    got = ckpt_utils.scan_checkpoint(str(tmp_path), "g_")
    assert got.endswith("g_00204000")
    got = ckpt_utils.scan_checkpoint(str(tmp_path), "g_", target_steps=100)
    assert got.endswith("g_00000100")
