"""Golden parity: our ConvNeXt encoder vs the reference torch encoder with the
same (randomly initialized) weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.config import EncoderConfig
from distilcodec_nabeel_tpu.models.encoder import ConvNeXtEncoder
from distilcodec_nabeel_tpu.utils.torch_import import convert_encoder

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def small_cfg():
    return EncoderConfig(
        input_channels=16,
        depths=(2, 2),
        dims=(32, 64),
        drop_path_rate=0.0,
        kernel_size=7,
    )


def test_encoder_matches_reference_small(ref, rng):
    cfg = small_cfg()
    torch_enc = ref.models.encoders.ConvNeXtEncoder(
        input_channels=cfg.input_channels,
        depths=list(cfg.depths),
        dims=list(cfg.dims),
        drop_path_rate=cfg.drop_path_rate,
        kernel_size=cfg.kernel_size,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in torch_enc.state_dict().items()}
    params = convert_encoder(sd, cfg)

    x = rng.standard_normal((2, 16, 50)).astype(np.float32)  # (B, C, T) torch
    with torch.no_grad():
        y_ref = torch_enc(torch.from_numpy(x)).numpy()  # (B, C_out, T)

    enc = ConvNeXtEncoder(cfg)
    y = enc.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    y = np.asarray(y).transpose(0, 2, 1)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_encoder_full_config_shapes(rng):
    cfg = EncoderConfig()
    enc = ConvNeXtEncoder(cfg)
    x = jnp.zeros((1, 20, 128))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    y = enc.apply({"params": params}, x)
    assert y.shape == (1, 20, 1024)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # reference encoder has 77.24 M params (SURVEY scale facts)
    assert abs(n_params - 77.24e6) / 77.24e6 < 0.01


def test_encoder_matches_reference_full(ref, rng):
    cfg = EncoderConfig()
    torch_enc = ref.models.encoders.ConvNeXtEncoder(
        input_channels=cfg.input_channels,
        depths=list(cfg.depths),
        dims=list(cfg.dims),
        drop_path_rate=cfg.drop_path_rate,
        kernel_size=cfg.kernel_size,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in torch_enc.state_dict().items()}
    params = convert_encoder(sd, cfg)

    x = rng.standard_normal((1, 128, 40)).astype(np.float32)
    with torch.no_grad():
        y_ref = torch_enc(torch.from_numpy(x)).numpy()

    enc = ConvNeXtEncoder(cfg)
    y = enc.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    y = np.asarray(y).transpose(0, 2, 1)
    np.testing.assert_allclose(y, y_ref, rtol=5e-4, atol=5e-4)
