"""Cached pre-quantized int8 codebook (TODO.md hoisting item): the cached
tables must reproduce the per-call-quantized ``int8`` mode's token ids
exactly (identical scores by construction), survive enable/disable, and stay
coherent through reset_codebook."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.quantization.vq import (
    nearest_code_int8,
    nearest_code_int8_cached,
    quantize_codebook_int8,
)
from test_codec_facade import MINI_CONFIG


@pytest.fixture()
def vq_mode_env():
    old = os.environ.get("DISTILCODEC_VQ_PRECISION")
    yield
    if old is None:
        os.environ.pop("DISTILCODEC_VQ_PRECISION", None)
    else:
        os.environ["DISTILCODEC_VQ_PRECISION"] = old


def test_cached_kernel_matches_per_call_quantization(rng):
    x = rng.standard_normal((37, 24)).astype(np.float32)
    embed = rng.standard_normal((64, 24)).astype(np.float32)
    ref = np.asarray(nearest_code_int8(jnp.asarray(x), jnp.asarray(embed)))
    eq, se, e2 = quantize_codebook_int8(embed)
    got = np.asarray(
        nearest_code_int8_cached(
            jnp.asarray(x),
            jnp.asarray(embed),
            jnp.asarray(eq),
            jnp.asarray(se),
            jnp.asarray(e2),
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_facade_cache_roundtrip(vq_mode_env, rng):
    audio = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    codec = DistilCodec(MINI_CONFIG)

    def ids(c):
        _, codes, *_ = c.encode([(audio, 24000)], raw_audio=True)
        return [t["in_codebook_id"] for t in codes[0]]

    # per-call int8 reference ids (fresh codec so the mode is traced in)
    os.environ["DISTILCODEC_VQ_PRECISION"] = "int8"
    int8_ids = ids(DistilCodec(MINI_CONFIG))
    os.environ.pop("DISTILCODEC_VQ_PRECISION")

    ref_ids = ids(codec)  # default 'high' mode

    codec.cache_int8_codebook()
    # instance-scoped, NOT process-global: the env var stays untouched and
    # a second codec in the same process keeps the default 'high' search
    assert "DISTILCODEC_VQ_PRECISION" not in os.environ
    assert codec._vq_search_mode == "int8_cached"
    layer = codec.variables["codebook"]["quantizer"]["grvq"]["rvqs_0"][
        "layers_0"
    ]
    assert layer["embed_q"].dtype == jnp.int8
    assert layer["embed_q"].shape == layer["embed"].shape
    cached_ids = ids(codec)
    assert cached_ids == int8_ids  # identical scores by construction
    assert ids(DistilCodec(MINI_CONFIG)) == ref_ids  # neighbor unaffected

    # decode still works with the extra leaves riding along
    wave = codec.decode_from_codes(
        [i + codec.tokens_id_offset for i in cached_ids]
    )
    assert np.isfinite(wave).all()

    # disable: tables dropped, default search restored
    codec.cache_int8_codebook(False)
    assert "embed_q" not in codec.variables["codebook"]["quantizer"]["grvq"][
        "rvqs_0"
    ]["layers_0"]
    assert ids(codec) == ref_ids


def test_reset_codebook_refreshes_cache(vq_mode_env, rng):
    codec = DistilCodec(MINI_CONFIG)
    codec.cache_int8_codebook()
    K = MINI_CONFIG["quantizer"]["codebook_size"]
    # mark half the codes unused -> reset_codebook reseeds them
    codec.reset_codebook({"g0r0": list(range(K // 2))}, save_path=None)
    layer = codec.variables["codebook"]["quantizer"]["grvq"]["rvqs_0"][
        "layers_0"
    ]
    eq, se, e2 = quantize_codebook_int8(np.asarray(layer["embed"]))
    np.testing.assert_array_equal(np.asarray(layer["embed_q"]), eq)
    np.testing.assert_allclose(np.asarray(layer["embed_norm2"]), e2)
