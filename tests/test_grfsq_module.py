"""DistilCodecModule with quantizer_type='grfsq' — full audio round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.codec import DistilCodecModule
from distilcodec_nabeel_tpu.config import CodecConfig
from test_codec_facade import MINI_CONFIG


def test_grfsq_module_roundtrip(rng):
    cfg = dict(MINI_CONFIG)
    cfg["quantizer"] = dict(cfg["quantizer"], quantizer_type="grfsq")
    module = DistilCodecModule(CodecConfig.from_dict(cfg))
    audio = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32) * 0.1)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), audio)
    wave, result = module.apply(variables, audio)
    assert wave.shape == (2, 64 * 64)
    assert np.isfinite(np.asarray(wave)).all()
    # codes layout (B, G*R, L); decode via module decode_codes (G,B,L,R)
    codes = np.asarray(result.codes)
    assert codes.shape == (2, 1, 64)
    b, gr, l = codes.shape
    glbr = jnp.asarray(codes.reshape(b, 1, 1, l).transpose(1, 0, 3, 2))
    wave2 = module.apply(variables, glbr, method="decode_codes")
    assert wave2.shape == (2, 64 * 64)
    # decode of own codes reproduces the forward quantized path
    feats = module.apply(
        variables, jnp.asarray(codes), method=lambda m, c: m.quantizer.decode(c)
    )
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(result.quantized), rtol=1e-5, atol=1e-5
    )
