"""Import reference PyTorch checkpoints into this framework's pytrees.

The reference stores single-file torch pickles ``g_{step:08d}`` holding
``{'generator','encoder','quantizer'}`` state dicts (reference:
distilcodec/distil_codec.py:479-484, :90-94).  These converters map those key
layouts onto our flax parameter trees:

* torch Conv1d weight (out, in, k)          -> flax (k, in, out)
* torch depthwise Conv1d weight (C, 1, k)   -> flax (k, 1, C)
* torch Linear weight (out, in)             -> flax kernel (in, out)
* torch ConvTranspose1d weight (in, out, k) -> flax pre-flipped conv kernel
  (k, in, out) with kernel reversed along k (we lower transposed conv as an
  input-dilated conv).
* weight-norm pairs: both the modern ``parametrizations.weight.original0/1``
  keys (torch.nn.utils.parametrizations.weight_norm, used by the reference)
  and legacy ``weight_g``/``weight_v`` are accepted.

Everything is pure numpy — torch is only needed by ``load_torch_checkpoint``.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ..config import CodecConfig, DecoderConfig, EncoderConfig, QuantizerConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference ``g_*`` pickle to nested numpy dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def to_np(obj):
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        return obj

    return to_np(ckpt)


def _conv_w(w: Array) -> Array:
    return np.transpose(w, (2, 1, 0)).copy()


def _convtr_w(w: Array) -> Array:
    # (in, out, k) -> flipped (k, in, out)
    return np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()


def _linear_w(w: Array) -> Array:
    return np.transpose(w, (1, 0)).copy()


def _wn_pair(sd: StateDict, prefix: str) -> tuple[Array, Array]:
    """Return (g, v) torch tensors for a weight-normed module."""
    p0 = f"{prefix}.parametrizations.weight.original0"
    if p0 in sd:
        return sd[p0], sd[f"{prefix}.parametrizations.weight.original1"]
    return sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]


def _wn_conv(sd: StateDict, prefix: str) -> dict:
    g, v = _wn_pair(sd, prefix)
    out = {"g": np.reshape(g, (-1,)).copy(), "v": _conv_w(v)}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        out["bias"] = np.asarray(bias).copy()
    return out


def _wn_convtr(sd: StateDict, prefix: str) -> dict:
    g, v = _wn_pair(sd, prefix)
    out = {"g": np.reshape(g, (-1,)).copy(), "v": _convtr_w(v)}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        out["bias"] = np.asarray(bias).copy()
    return out


def _plain_conv(sd: StateDict, prefix: str) -> dict:
    out = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).copy()
    return out


def _plain_convtr(sd: StateDict, prefix: str) -> dict:
    out = {"kernel": _convtr_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).copy()
    return out


def _ln(sd: StateDict, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]).copy(),
        "bias": np.asarray(sd[f"{prefix}.bias"]).copy(),
    }


def _convnext_block(sd: StateDict, prefix: str) -> dict:
    out = {
        "dwconv": _plain_conv(sd, f"{prefix}.dwconv"),
        "norm": _ln(sd, f"{prefix}.norm"),
        "pwconv1": {
            "kernel": _linear_w(sd[f"{prefix}.pwconv1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.pwconv1.bias"]).copy(),
        },
        "pwconv2": {
            "kernel": _linear_w(sd[f"{prefix}.pwconv2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.pwconv2.bias"]).copy(),
        },
    }
    if f"{prefix}.gamma" in sd:
        out["gamma"] = np.asarray(sd[f"{prefix}.gamma"]).copy()
    return out


def convert_encoder(sd: StateDict, cfg: EncoderConfig) -> dict:
    """Reference ConvNeXtEncoder state dict -> flax params
    (key layout: distilcodec/models/encoders.py:20-61)."""
    params: dict = {}
    params["stem_conv"] = _plain_conv(sd, "downsample_layers.0.0")
    params["stem_norm"] = _ln(sd, "downsample_layers.0.1")
    for i in range(1, len(cfg.depths)):
        params[f"expand_norm_{i}"] = _ln(sd, f"downsample_layers.{i}.0")
        params[f"expand_conv_{i}"] = _plain_conv(sd, f"downsample_layers.{i}.1")
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            params[f"stage_{i}_block_{j}"] = _convnext_block(sd, f"stages.{i}.{j}")
    params["final_norm"] = _ln(sd, "norm")
    return params


def convert_quantizer(sd: StateDict, cfg: QuantizerConfig) -> tuple[dict, dict]:
    """Reference DownsampleGRVQ state dict -> (flax params, codebook state).

    Key layout: distilcodec/vector_quantization/grfvq.py:68-96 (down/upsample
    sequentials) and utils/residual_vq.py:61-68 + vector_quantize_pytorch.py:
    319-327 (projections + codebook buffers).  The reference's ``upsample``
    Sequential is built over ``reversed(enumerate(downsample_factor))``
    (grfvq.py:83-96), so its sequential index s maps to original stage index
    ``rev[s]``.
    """
    factors = cfg.downsample_factor
    params: dict = {}
    for i in range(len(factors)):
        params[f"downsample_{i}_conv"] = _plain_conv(sd, f"downsample.{i}.0")
        params[f"downsample_{i}_block"] = _convnext_block(sd, f"downsample.{i}.1")
    rev = list(reversed(range(len(factors))))
    for s, i in enumerate(rev):
        params[f"upsample_{i}_conv"] = _plain_convtr(sd, f"upsample.{s}.0")
        params[f"upsample_{i}_block"] = _convnext_block(sd, f"upsample.{s}.1")

    grvq_params: dict = {}
    codebook: dict = {"grvq": {}}
    for g in range(cfg.n_groups):
        rp = f"grvq.rvqs.{g}"
        group_params: dict = {}
        if f"{rp}.project_in.weight" in sd:
            group_params["project_in"] = {
                "kernel": _linear_w(sd[f"{rp}.project_in.weight"]),
                "bias": np.asarray(sd[f"{rp}.project_in.bias"]).copy(),
            }
            group_params["project_out"] = {
                "kernel": _linear_w(sd[f"{rp}.project_out.weight"]),
                "bias": np.asarray(sd[f"{rp}.project_out.bias"]).copy(),
            }
        grvq_params[f"rvqs_{g}"] = group_params
        group_cb: dict = {}
        for r in range(cfg.n_codebooks):
            cp = f"{rp}.layers.{r}._codebook"
            group_cb[f"layers_{r}"] = {
                "embed": np.asarray(sd[f"{cp}.embed"])[0].copy(),
                "embed_avg": np.asarray(sd[f"{cp}.embed_avg"])[0].copy(),
                "cluster_size": np.asarray(sd[f"{cp}.cluster_size"])[0].copy(),
                "initted": np.float32(np.asarray(sd[f"{cp}.initted"]).reshape(())),
            }
        codebook["grvq"][f"rvqs_{g}"] = group_cb
    params["grvq"] = grvq_params
    return params, codebook


def convert_codec_checkpoint(
    ckpt: dict, cfg: CodecConfig, *, include_quantizer: bool = True
) -> dict:
    """Full reference ``g_*`` checkpoint dict -> our variables tree:
    ``{'params': {'encoder', 'quantizer', 'generator'}, 'codebook': ...}``.

    ``include_quantizer=False`` skips the quantizer/codebook conversion —
    the DMS distill init (README.md:44-53, train_config.json:46-51
    ``quantizer_transfer: false``) inherits only encoder/decoder from a
    TEACHER whose quantizer architecture (e.g. 8-residual x 4-group x 1024)
    does not match the student ``cfg`` and must not be converted against it.
    """
    variables = {"params": {"encoder": convert_encoder(ckpt["encoder"], cfg.encoder)}}
    if include_quantizer:
        q_params, q_codebook = convert_quantizer(ckpt["quantizer"], cfg.quantizer)
        variables["params"]["quantizer"] = q_params
        variables["codebook"] = {"quantizer": q_codebook}
    if "generator" in ckpt:
        variables["params"]["generator"] = convert_generator(
            ckpt["generator"], cfg.decoder
        )
    return variables


def _conv2d_w(w: Array) -> Array:
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(w, (2, 3, 1, 0)).copy()


def _wn_conv2d(sd: StateDict, prefix: str) -> dict:
    g, v = _wn_pair(sd, prefix)
    out = {"g": np.reshape(g, (-1,)).copy(), "v": _conv2d_w(v)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).copy()
    return out


def _plain_conv2d_as_wn(sd: StateDict, prefix: str) -> dict:
    """Unnormalized Conv2d mapped onto a WNConv2d(use_weight_norm=False)."""
    out = {"v": _conv2d_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).copy()
    return out


def convert_mpd(sd: StateDict, n_periods: int) -> dict:
    """Reference MultiPeriodDiscriminator (descriminators.py:128-217)."""
    params: dict = {}
    for i in range(n_periods):
        dp: dict = {}
        for j in range(5):
            dp[f"convs_{j}"] = _wn_conv2d(sd, f"discriminators.{i}.convs.{j}")
        dp["conv_post"] = _wn_conv2d(sd, f"discriminators.{i}.conv_post")
        params[f"discriminators_{i}"] = dp
    return params


def _sn_conv1d(sd: StateDict, prefix: str) -> tuple[dict, dict]:
    """torch old-style spectral_norm keys: weight_orig / weight_u / weight_v."""
    params = {"kernel": _conv_w(sd[f"{prefix}.weight_orig"])}
    if f"{prefix}.bias" in sd:
        params["bias"] = np.asarray(sd[f"{prefix}.bias"]).copy()
    spectral = {
        "u": np.asarray(sd[f"{prefix}.weight_u"]).copy(),
        "v": np.asarray(sd[f"{prefix}.weight_v"]).copy(),
    }
    return params, spectral


def convert_msd(sd: StateDict) -> tuple[dict, dict]:
    """Reference MultiScaleDiscriminator (descriminators.py:220-321):
    discriminator 0 spectral-normed, 1-2 weight-normed.  Returns
    (params, spectral-state)."""
    params: dict = {}
    spectral: dict = {}
    for i in range(3):
        dp: dict = {}
        ds: dict = {}
        for j in range(7):
            prefix = f"discriminators.{i}.convs.{j}"
            if i == 0:
                dp[f"convs_{j}"], ds[f"convs_{j}"] = _sn_conv1d(sd, prefix)
            else:
                dp[f"convs_{j}"] = _wn_conv(sd, prefix)
        prefix = f"discriminators.{i}.conv_post"
        if i == 0:
            dp["conv_post"], ds["conv_post"] = _sn_conv1d(sd, prefix)
            spectral[f"discriminators_{i}"] = ds
        else:
            dp["conv_post"] = _wn_conv(sd, prefix)
        params[f"discriminators_{i}"] = dp
    return params, spectral


def convert_msstft(sd: StateDict, n_scales: int = 5, n_dilations: int = 3) -> dict:
    """Reference MultiScaleSTFTDiscriminator (msstftd.py:107-269).  The first
    conv of each sub-discriminator is unnormalized (msstftd.py:163-169)."""
    params: dict = {}
    for i in range(n_scales):
        dp: dict = {}
        base = f"discriminators.{i}"
        dp["convs_0"] = _plain_conv2d_as_wn(sd, f"{base}.convs.0.conv")
        for j in range(1, n_dilations + 2):
            dp[f"convs_{j}"] = _wn_conv2d(sd, f"{base}.convs.{j}.conv")
        dp["conv_post"] = _wn_conv2d(sd, f"{base}.conv_post.conv")
        params[f"discriminators_{i}"] = dp
    return params


def _resblock1(sd: StateDict, prefix: str, n: int = 3) -> dict:
    out = {}
    for j in range(n):
        out[f"convs1_{j}"] = _wn_conv(sd, f"{prefix}.convs1.{j}")
        out[f"convs2_{j}"] = _wn_conv(sd, f"{prefix}.convs2.{j}")
    return out


def convert_generator(sd: StateDict, cfg: DecoderConfig) -> dict:
    """Reference HiFiGANGenerator state dict -> flax params
    (key layout: distilcodec/models/generators.py:50-116)."""
    params: dict = {"conv_pre": _wn_conv(sd, "conv_pre")}
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = _wn_convtr(sd, f"ups.{i}")
        blocks = {}
        for b in range(len(cfg.resblock_kernel_sizes)):
            blocks[f"blocks_{b}"] = _resblock1(sd, f"resblocks.{i}.blocks.{b}")
        params[f"resblocks_{i}"] = blocks
        if cfg.use_template:
            params[f"noise_convs_{i}"] = _plain_conv(sd, f"noise_convs.{i}")
    params["conv_post"] = _wn_conv(sd, "conv_post")
    return params
