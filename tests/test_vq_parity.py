"""Golden parity: our GRFVQ quantizer stack vs the reference torch stack
(student 1g/1r config and teacher-style multi-group/multi-residual configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.config import QuantizerConfig
from distilcodec_nabeel_tpu.quantization.grvq import DownsampleGRVQ
from distilcodec_nabeel_tpu.quantization.vq import nearest_code_xla, pairwise_distance
from distilcodec_nabeel_tpu.utils.torch_import import convert_quantizer

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def build_pair(ref, cfg: QuantizerConfig):
    torch_q = ref.vector_quantization.grfvq.DownsampleGRVQ(
        input_dim=cfg.input_dim,
        n_codebooks=cfg.n_codebooks,
        n_groups=cfg.n_groups,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        downsample_factor=tuple(cfg.downsample_factor),
        ema_decay=cfg.ema_decay,
        codebook_diversity_loss_weight=cfg.codebook_diversity_loss_weight,
        codebook_diversity_temperature=cfg.codebook_diversity_temperature,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in torch_q.state_dict().items()}
    params, codebook = convert_quantizer(sd, cfg)
    ours = DownsampleGRVQ(cfg)
    return torch_q, ours, {"params": params, "codebook": codebook}


def _student_small():
    return QuantizerConfig(
        input_dim=32,
        n_groups=1,
        n_codebooks=1,
        codebook_size=64,
        codebook_dim=48,
        downsample_factor=(1,),
    )


def _teacher_small():
    return QuantizerConfig(
        input_dim=32,
        n_groups=2,
        n_codebooks=3,
        codebook_size=32,
        codebook_dim=48,
        downsample_factor=(2,),
    )


def test_nearest_code_matches_naive(rng):
    x = rng.standard_normal((40, 8)).astype(np.float32)
    e = rng.standard_normal((17, 8)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - e[None], axis=-1)
    ind = np.asarray(nearest_code_xla(jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_array_equal(ind, d.argmin(-1))
    d2 = np.asarray(pairwise_distance(jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_allclose(d2, d, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("make_cfg", [_student_small, _teacher_small])
def test_forward_parity(ref, rng, make_cfg):
    cfg = make_cfg()
    torch_q, ours, variables = build_pair(ref, cfg)
    x = rng.standard_normal((2, cfg.input_dim, 20)).astype(np.float32)
    with torch.no_grad():
        res_ref = torch_q(torch.from_numpy(x))
    res = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    q_ref = res_ref.quantized.numpy()  # (B, C, T)
    q = np.asarray(res.quantized).transpose(0, 2, 1)
    np.testing.assert_allclose(q, q_ref, rtol=3e-4, atol=3e-4)
    codes_ref = res_ref.codes.numpy()  # (g, b, l, r)
    np.testing.assert_array_equal(np.asarray(res.codes), codes_ref)
    fup_ref = res_ref.quantized_fup.numpy()  # (b, l, g*dc)
    np.testing.assert_allclose(
        np.asarray(res.quantized_fup), fup_ref, rtol=3e-4, atol=3e-4
    )
    pjt_ref = res_ref.x_pjt_in.numpy()
    np.testing.assert_allclose(
        np.asarray(res.x_pjt_in), pjt_ref, rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("make_cfg", [_student_small, _teacher_small])
def test_encode_decode_parity(ref, rng, make_cfg):
    cfg = make_cfg()
    torch_q, ours, variables = build_pair(ref, cfg)
    x = rng.standard_normal((2, cfg.input_dim, 20)).astype(np.float32)
    with torch.no_grad():
        ind_ref = torch_q.encode(torch.from_numpy(x)).numpy()  # (b, g*r, l)
    ind = np.asarray(
        ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), method="encode")
    )
    np.testing.assert_array_equal(ind, ind_ref)

    # decode expects 'g b l r'
    codes = torch_q(torch.from_numpy(x)).codes
    with torch.no_grad():
        z_ref = torch_q.decode(codes).numpy()  # (b, c, t)
    z = np.asarray(
        ours.apply(
            variables, jnp.asarray(codes.numpy()), method="decode"
        )
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(z, z_ref, rtol=3e-4, atol=3e-4)


def test_decode_reproduces_forward_quantized(ref, rng):
    """quantizer.decode(codes) == forward().quantized (SURVEY verified fact)."""
    cfg = _student_small()
    _, ours, variables = build_pair(ref, cfg)
    x = jnp.asarray(rng.standard_normal((2, 20, cfg.input_dim)).astype(np.float32))
    res = ours.apply(variables, x)
    z = ours.apply(variables, res.codes, method="decode")
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(res.quantized), rtol=1e-5, atol=1e-5
    )
