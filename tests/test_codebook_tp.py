"""Codebook tensor parallelism reachable from the facade: token ids through
the full encode path with the (K, D) table sharded over a `model` mesh axis
must equal the replicated path's exactly (allreduce-argmin with lowest-index
tie-break — SURVEY §2.2 TP row; reference hot loop
vector_quantize_pytorch.py:496 is a replicated cdist)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.parallel.codebook_shard import (
    active_codebook_sharding,
    set_codebook_sharding,
    sharded_nearest_code,
    shard_codebook,
)
from test_codec_facade import MINI_CONFIG


@pytest.fixture()
def model_mesh():
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    yield mesh
    set_codebook_sharding(None)  # never leak activation into other tests


def test_facade_codebook_tp_matches_replicated(model_mesh, rng):
    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    codec = DistilCodec(MINI_CONFIG)

    _, codes_ref, *_ = codec.encode([(audio, 24000)], raw_audio=True)
    ref_ids = [t["in_codebook_id"] for t in codes_ref[0]]

    codec.use_codebook_sharding(model_mesh)
    assert active_codebook_sharding() is not None
    # the tables are physically distributed along the model axis
    embed = codec.variables["codebook"]["quantizer"]["grvq"]["rvqs_0"][
        "layers_0"
    ]["embed"]
    assert not embed.sharding.is_fully_replicated

    _, codes_tp, *_ = codec.encode([(audio, 24000)], raw_audio=True)
    tp_ids = [t["in_codebook_id"] for t in codes_tp[0]]
    assert tp_ids == ref_ids

    # decode path still works with sharded tables (GSPMD-partitioned gather)
    wave = codec.decode_from_codes(
        [i + codec.tokens_id_offset for i in tp_ids]
    )
    assert np.isfinite(wave).all()

    # deactivation restores the replicated search
    codec.use_codebook_sharding(None)
    assert active_codebook_sharding() is None
    _, codes_off, *_ = codec.encode([(audio, 24000)], raw_audio=True)
    assert [t["in_codebook_id"] for t in codes_off[0]] == ref_ids


def test_tp_tie_breaking_lowest_global_index(model_mesh):
    """Duplicate codes across shard boundaries: the winner must be the lowest
    global id, exactly like the replicated argmin."""
    K, D = 64, 8
    rng = np.random.default_rng(0)
    embed = rng.standard_normal((K, D)).astype(np.float32)
    # rows 3 and 35 identical (different shards on an 8-way split: 3 -> shard
    # 0, 35 -> shard 4); rows 12 and 13 identical within one shard
    embed[35] = embed[3]
    embed[13] = embed[12]
    x = np.stack([embed[3], embed[12], embed[35] + 1e-3]).astype(np.float32)

    replicated = np.asarray(
        jnp.argmin(
            jnp.sum((jnp.asarray(x)[:, None] - jnp.asarray(embed)) ** 2, -1),
            axis=-1,
        )
    )
    sharded = np.asarray(
        sharded_nearest_code(
            jnp.asarray(x), shard_codebook(jnp.asarray(embed), model_mesh),
            model_mesh,
        )
    )
    np.testing.assert_array_equal(sharded, replicated)
    assert sharded[0] == 3 and sharded[1] == 12


def test_explicit_mode_bypasses_tp_fast_path(rng):
    """An EXPLICIT per-instance vq_search_mode must take precedence over the
    codebook-TP fast path (advisor r3): with sharding active, mode=None
    dispatches to the allreduce-argmin, while an explicit mode routes to the
    plain XLA search in that mode — so two codecs with different VQ
    precisions coexist under active sharding."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from distilcodec_nabeel_tpu.parallel.codebook_shard import (
        set_codebook_sharding,
    )
    from distilcodec_nabeel_tpu.quantization.vq import (
        nearest_code,
        nearest_code_xla,
    )

    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    embed = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    set_codebook_sharding(mesh, "model")
    try:
        got = nearest_code(x, embed, "highest")
        want = nearest_code_xla(x, embed, "highest")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # and the default path still matches (through the TP allreduce-argmin)
        got_tp = nearest_code(x, embed)
        np.testing.assert_array_equal(np.asarray(got_tp), np.asarray(want))
    finally:
        set_codebook_sharding(None)
