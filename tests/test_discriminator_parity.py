"""Golden parity for the three discriminator families vs the reference torch
implementations with imported weights — logits and feature maps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distilcodec_nabeel_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from distilcodec_nabeel_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from distilcodec_nabeel_tpu.utils.torch_import import (
    convert_mpd,
    convert_msd,
    convert_msstft,
)

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_mpd_parity(ref, rng):
    periods = (2, 3)
    t_mpd = ref.models.descriminators.MultiPeriodDiscriminator().eval()
    # keep only the first two periods for speed
    t_mpd.discriminators = torch.nn.ModuleList(list(t_mpd.discriminators[:2]))
    sd = {k: v.detach().numpy() for k, v in t_mpd.state_dict().items()}
    params = convert_mpd(sd, n_periods=2)

    y = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    yh = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        rs, gs, fr, fg = t_mpd(
            torch.from_numpy(y[:, None, :]), torch.from_numpy(yh[:, None, :])
        )
    mpd = MultiPeriodDiscriminator(periods=periods)
    o_rs, o_gs, o_fr, o_fg = mpd.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(yh)
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(o_rs[i]), rs[i].numpy(), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(o_gs[i]), gs[i].numpy(), rtol=2e-3, atol=2e-4
        )
        # feature maps: ours are NHWC, torch NCHW
        for a, b in zip(o_fr[i], fr[i]):
            np.testing.assert_allclose(
                np.transpose(np.asarray(a), (0, 3, 1, 2)),
                b.numpy(),
                rtol=2e-3,
                atol=2e-4,
            )


def test_msd_parity(ref, rng):
    t_msd = ref.models.descriminators.MultiScaleDiscriminator(
        msd_config={"unused": True}  # inverted branch -> default arch
    ).eval()
    sd = {k: v.detach().numpy() for k, v in t_msd.state_dict().items()}
    params, spectral = convert_msd(sd)

    y = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    yh = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    with torch.no_grad():
        rs, gs, fr, fg = t_msd(
            torch.from_numpy(y[:, None, :]), torch.from_numpy(yh[:, None, :])
        )
    msd = MultiScaleDiscriminator()
    o_rs, o_gs, o_fr, o_fg = msd.apply(
        {"params": params, "spectral": spectral},
        jnp.asarray(y),
        jnp.asarray(yh),
        update_stats=False,
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(o_rs[i]), rs[i].numpy(), rtol=5e-3, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(o_gs[i]), gs[i].numpy(), rtol=5e-3, atol=5e-4
        )


def test_msstft_parity(ref, rng):
    cfg = {
        "filters": 8,
        "in_channels": 1,
        "out_channels": 1,
        "n_ffts": [512, 256],
        "hop_lengths": [128, 64],
        "win_lengths": [512, 256],
    }
    t_d = ref.models.msstftd.MultiScaleSTFTDiscriminator(msstft_config=cfg).eval()
    sd = {k: v.detach().numpy() for k, v in t_d.state_dict().items()}
    params = convert_msstft(sd, n_scales=2)

    y = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        logits, fmaps = t_d(torch.from_numpy(y[:, None, :]))
    d = MultiScaleSTFTDiscriminator(
        filters=8,
        n_ffts=tuple(cfg["n_ffts"]),
        hop_lengths=tuple(cfg["hop_lengths"]),
        win_lengths=tuple(cfg["win_lengths"]),
    )
    o_logits, o_fmaps = d.apply({"params": params}, jnp.asarray(y))
    for i in range(2):
        ours = np.transpose(np.asarray(o_logits[i]), (0, 3, 1, 2))
        np.testing.assert_allclose(
            ours, logits[i].numpy(), rtol=5e-3, atol=5e-4
        )


def test_disc_batch_pack_bit_identical(rng):
    """batch_pack=True (real+fake as one concatenated batch) must reproduce
    the two-call path to accumulation round-off for every weight-normed
    family (convs are batch-row independent; XLA may tile reductions
    differently at 2B, so exact-to-1e-10, not bit-exact) and keep the
    spectral-norm scale's sequential power-iteration semantics (it is
    excluded from packing)."""
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.config import CodecConfig
    from distilcodec_nabeel_tpu.training.train import Discriminators

    from test_codec_facade import MINI_CONFIG

    base = dict(MINI_CONFIG)
    base["descriminators"] = {
                "MultiPeriodDiscriminator": {
                    "periods": [2, 3], "kernal_size": 5, "stride": 3,
                },
                "MultiScaleDiscriminator": {
                    "override_layers": [
                        [16, 15, 1, 1, 7],
                        [16, 41, 4, 4, 20],
                        [32, 5, 1, 1, 2],
                    ],
                },
                "MultiScaleSTFTDiscriminator": {
                    "filters": 8, "n_ffts": [256, 128],
                    "hop_lengths": [64, 32], "win_lengths": [256, 128],
                },
    }
    cfg = CodecConfig.from_dict(base)
    y = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)
    yh = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.1)
    plain = Discriminators(cfg)
    packed = Discriminators(cfg, batch_pack=True)
    vs = plain.init(jax.random.PRNGKey(0), y, yh)
    # identical param tree (packing is a pure execution-shape change)
    vs2 = packed.init(jax.random.PRNGKey(0), y, yh)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs2)

    out_a = plain.apply(vs, y, yh, update_stats=True, mutable=["spectral"])
    out_b = packed.apply(vs, y, yh, update_stats=True, mutable=["spectral"])
    la, lb = jax.tree_util.tree_leaves(out_a), jax.tree_util.tree_leaves(out_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10
        )
