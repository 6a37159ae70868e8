"""Data-parallel batched inference: sharded facade == unsharded facade."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from distilcodec_nabeel_tpu import DistilCodec
from test_codec_facade import MINI_CONFIG


def test_dp_encode_matches_unsharded(rng):
    codec = DistilCodec(MINI_CONFIG)
    audios = [
        ((rng.standard_normal(4096) * 0.1).astype(np.float32), 24000)
        for _ in range(8)
    ]
    ids_ref = codec.encode_to_token_ids(audios, raw_audio=True, plus_offset=False)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    codec.use_data_parallel(mesh)
    ids_dp = codec.encode_to_token_ids(audios, raw_audio=True, plus_offset=False)
    assert ids_dp == ids_ref

    waves_ref = codec.decode_from_codes_batch(
        [i[:32] for i in ids_ref], minus_token_offset=False
    )
    np.testing.assert_allclose(
        waves_ref[0][0, 0],
        codec.decode_from_codes(ids_ref[0][:32], minus_token_offset=False)[0, 0],
        rtol=1e-4,
        atol=1e-5,
    )


def test_grad_accumulation_smoke(rng):
    import dataclasses

    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.training.train import Trainer
    from test_training import mini_codec_cfg, mini_train_cfg

    tcfg = dataclasses.replace(mini_train_cfg(), accumulation_steps=2)
    trainer = Trainer(mini_codec_cfg(), tcfg, steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0), segment_len=2048)
    audio = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)
    step = jax.jit(trainer.train_step)
    s1, _ = step(state, audio, jax.random.PRNGKey(1))
    # after the first micro-step params must be unchanged (grads accumulated)
    p0 = jax.tree_util.tree_leaves(state.gen_params)[0]
    p1 = jax.tree_util.tree_leaves(s1.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    s2, _ = step(s1, audio, jax.random.PRNGKey(2))
    p2 = jax.tree_util.tree_leaves(s2.gen_params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
