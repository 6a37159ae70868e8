"""Export our variables back to the reference's torch ``g_*`` pickle layout —
the inverse of torch_import — so checkpoints round-trip between frameworks
(reference format: distilcodec/distil_codec.py:479-484)."""

from __future__ import annotations

import numpy as np

from ..config import CodecConfig, DecoderConfig, EncoderConfig, QuantizerConfig


def _t(x):
    import torch

    return torch.from_numpy(np.array(x, copy=True))


def _conv_w_inv(k):  # (k, in, out) -> (out, in, k)
    return np.transpose(np.asarray(k), (2, 1, 0))


def _convtr_w_inv(k):  # flipped (k, in, out) -> (in, out, k)
    return np.transpose(np.asarray(k)[::-1], (1, 2, 0))


def _linear_w_inv(k):  # (in, out) -> (out, in)
    return np.transpose(np.asarray(k), (1, 0))


def _emit_wn_conv(sd, prefix, p, g_shape):
    sd[f"{prefix}.parametrizations.weight.original0"] = _t(
        np.reshape(np.asarray(p["g"]), g_shape)
    )
    sd[f"{prefix}.parametrizations.weight.original1"] = _t(_conv_w_inv(p["v"]))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_wn_convtr(sd, prefix, p, g_shape):
    sd[f"{prefix}.parametrizations.weight.original0"] = _t(
        np.reshape(np.asarray(p["g"]), g_shape)
    )
    sd[f"{prefix}.parametrizations.weight.original1"] = _t(_convtr_w_inv(p["v"]))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(_conv_w_inv(p["kernel"]))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_convtr(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(_convtr_w_inv(p["kernel"]))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_block(sd, prefix, p):
    _emit_conv(sd, f"{prefix}.dwconv", p["dwconv"])
    _emit_ln(sd, f"{prefix}.norm", p["norm"])
    sd[f"{prefix}.pwconv1.weight"] = _t(_linear_w_inv(p["pwconv1"]["kernel"]))
    sd[f"{prefix}.pwconv1.bias"] = _t(p["pwconv1"]["bias"])
    sd[f"{prefix}.pwconv2.weight"] = _t(_linear_w_inv(p["pwconv2"]["kernel"]))
    sd[f"{prefix}.pwconv2.bias"] = _t(p["pwconv2"]["bias"])
    if "gamma" in p:
        sd[f"{prefix}.gamma"] = _t(p["gamma"])


def export_encoder(params: dict, cfg: EncoderConfig) -> dict:
    sd: dict = {}
    _emit_conv(sd, "downsample_layers.0.0", params["stem_conv"])
    _emit_ln(sd, "downsample_layers.0.1", params["stem_norm"])
    for i in range(1, len(cfg.depths)):
        _emit_ln(sd, f"downsample_layers.{i}.0", params[f"expand_norm_{i}"])
        _emit_conv(sd, f"downsample_layers.{i}.1", params[f"expand_conv_{i}"])
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            _emit_block(sd, f"stages.{i}.{j}", params[f"stage_{i}_block_{j}"])
    _emit_ln(sd, "norm", params["final_norm"])
    return sd


def export_generator(params: dict, cfg: DecoderConfig) -> dict:
    sd: dict = {}
    _emit_wn_conv(sd, "conv_pre", params["conv_pre"], (-1, 1, 1))
    for i in range(len(cfg.upsample_rates)):
        _emit_wn_convtr(sd, f"ups.{i}", params[f"ups_{i}"], (-1, 1, 1))
        blocks = params[f"resblocks_{i}"]
        for b in range(len(cfg.resblock_kernel_sizes)):
            bp = blocks[f"blocks_{b}"]
            for j in range(3):
                _emit_wn_conv(
                    sd,
                    f"resblocks.{i}.blocks.{b}.convs1.{j}",
                    bp[f"convs1_{j}"],
                    (-1, 1, 1),
                )
                _emit_wn_conv(
                    sd,
                    f"resblocks.{i}.blocks.{b}.convs2.{j}",
                    bp[f"convs2_{j}"],
                    (-1, 1, 1),
                )
        if cfg.use_template and f"noise_convs_{i}" in params:
            _emit_conv(sd, f"noise_convs.{i}", params[f"noise_convs_{i}"])
    _emit_wn_conv(sd, "conv_post", params["conv_post"], (-1, 1, 1))
    return sd


def export_quantizer(params: dict, codebook: dict, cfg: QuantizerConfig) -> dict:
    sd: dict = {}
    factors = cfg.downsample_factor
    for i in range(len(factors)):
        _emit_conv(sd, f"downsample.{i}.0", params[f"downsample_{i}_conv"])
        _emit_block(sd, f"downsample.{i}.1", params[f"downsample_{i}_block"])
    rev = list(reversed(range(len(factors))))
    for s, i in enumerate(rev):
        _emit_convtr(sd, f"upsample.{s}.0", params[f"upsample_{i}_conv"])
        _emit_block(sd, f"upsample.{s}.1", params[f"upsample_{i}_block"])
    for g in range(cfg.n_groups):
        # projection-free configs (codebook_dim == input_dim / n_groups) have
        # NO grvq params at all — flax omits empty param subtrees; the
        # codebook collection below always exists
        gp = params.get("grvq", {}).get(f"rvqs_{g}", {})
        rp = f"grvq.rvqs.{g}"
        if "project_in" in gp:
            sd[f"{rp}.project_in.weight"] = _t(
                _linear_w_inv(gp["project_in"]["kernel"])
            )
            sd[f"{rp}.project_in.bias"] = _t(gp["project_in"]["bias"])
            sd[f"{rp}.project_out.weight"] = _t(
                _linear_w_inv(gp["project_out"]["kernel"])
            )
            sd[f"{rp}.project_out.bias"] = _t(gp["project_out"]["bias"])
        gcb = codebook["grvq"][f"rvqs_{g}"]
        for r in range(cfg.n_codebooks):
            lcb = gcb[f"layers_{r}"]
            cp = f"{rp}.layers.{r}._codebook"
            sd[f"{cp}.embed"] = _t(np.asarray(lcb["embed"])[None])
            sd[f"{cp}.embed_avg"] = _t(np.asarray(lcb["embed_avg"])[None])
            sd[f"{cp}.cluster_size"] = _t(np.asarray(lcb["cluster_size"])[None])
            sd[f"{cp}.initted"] = _t(
                np.asarray([np.float32(lcb["initted"])], dtype=np.float32)
            )
    return sd


def export_codec_checkpoint(variables: dict, cfg: CodecConfig, filepath: str):
    """Write a torch pickle the reference's ``load_checkpoint`` +
    ``load_state_dict`` path accepts."""
    import torch

    params = variables["params"]
    obj = {
        "encoder": export_encoder(params["encoder"], cfg.encoder),
        "quantizer": export_quantizer(
            params["quantizer"],
            variables["codebook"]["quantizer"],
            cfg.quantizer,
        ),
    }
    if "generator" in params:
        obj["generator"] = export_generator(params["generator"], cfg.decoder)
    torch.save(obj, filepath)
