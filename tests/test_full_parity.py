"""Full-pipeline token-id parity at production scale.

Builds the full-size reference torch pipeline (mel -> ConvNeXt encoder ->
GRFVQ) with random weights, imports those exact weights into our framework,
and checks token-id agreement on a real 24 kHz waveform — the BASELINE.json
parity gate exercised end-to-end (random weights stand in for the published
g_00204000 checkpoint, which is not available offline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from distilcodec_nabeel_tpu import DistilCodec
from distilcodec_nabeel_tpu.config import load_model_config
from distilcodec_nabeel_tpu.utils.audio_io import load_wav

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402

CONFIG_PATH = "/root/reference/configs/model_config.json"
WAV = "/root/reference/data/org_audios/0000.wav"


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_full_encode_token_parity(ref, tmp_path_factory):
    cfg = load_model_config(CONFIG_PATH)

    torch.manual_seed(0)
    t_enc = ref.models.encoders.ConvNeXtEncoder(
        input_channels=cfg.encoder.input_channels,
        depths=list(cfg.encoder.depths),
        dims=list(cfg.encoder.dims),
        drop_path_rate=cfg.encoder.drop_path_rate,
        kernel_size=cfg.encoder.kernel_size,
    ).eval()
    t_q = ref.vector_quantization.grfvq.DownsampleGRVQ(
        input_dim=cfg.quantizer.input_dim,
        n_codebooks=cfg.quantizer.n_codebooks,
        n_groups=cfg.quantizer.n_groups,
        codebook_size=cfg.quantizer.codebook_size,
        codebook_dim=cfg.quantizer.codebook_dim,
        downsample_factor=tuple(cfg.quantizer.downsample_factor),
        ema_decay=cfg.quantizer.ema_decay,
        codebook_diversity_loss_weight=cfg.quantizer.codebook_diversity_loss_weight,
        codebook_diversity_temperature=cfg.quantizer.codebook_diversity_temperature,
    ).eval()
    t_mel = ref.models.mel_spec.LogMelSpectrogram(
        sample_rate=cfg.spec.sampling_rate,
        n_fft=cfg.spec.n_fft,
        win_length=cfg.spec.win_size,
        hop_length=cfg.spec.hop_size,
        n_mels=cfg.spec.num_mels,
        f_min=cfg.spec.fmin,
        f_max=cfg.spec.fmax,
    )

    # 1 second of real audio, reference preprocessing (1-sample left pad)
    audio, sr = load_wav(WAV, sr=24000)
    audio = audio[:24000]
    padded = np.concatenate([[0.0], audio]).astype(np.float32)

    with torch.no_grad():
        mel = t_mel(torch.from_numpy(padded[None, None, :]))
        encoded = t_enc(mel)
        res = t_q(encoded)
        codes_ref = res.codes.numpy()  # (1, 1, L, 1)

    # our side: import the torch weights through the facade converter
    from distilcodec_nabeel_tpu.utils.torch_import import (
        convert_encoder,
        convert_quantizer,
    )

    enc_sd = {k: v.numpy() for k, v in t_enc.state_dict().items()}
    q_sd = {k: v.numpy() for k, v in t_q.state_dict().items()}
    codec = DistilCodec(load_model_config(CONFIG_PATH))
    params = dict(codec.variables["params"])
    params["encoder"] = convert_encoder(enc_sd, cfg.encoder)
    q_params, q_codebook = convert_quantizer(q_sd, cfg.quantizer)
    params["quantizer"] = q_params
    codec.variables = {
        "params": params,
        "codebook": {"quantizer": q_codebook},
    }

    result, codes_list, *_ , n_hop = codec.encode([(audio, 24000)], raw_audio=True)
    codes = np.asarray(result.codes)  # (G, B, L, R)
    assert codes.shape == codes_ref.shape

    agree = (codes == codes_ref).mean()
    # random weights give near-degenerate distances; trained codebooks
    # separate much better.  Require >=99% agreement here.
    assert agree >= 0.99, f"token agreement {agree:.4f}"

    # stage-by-stage: mel must match tightly (the first place parity dies)
    mel_ours = np.asarray(
        codec.module.apply(
            codec.variables, jnp.asarray(padded[None, :]), method="mel"
        )
    )  # (1, T, M)
    np.testing.assert_allclose(
        mel_ours.transpose(0, 2, 1), mel.numpy(), rtol=2e-3, atol=2e-3
    )
