"""Configuration handling.

The reference wraps two raw JSON files (``configs/model_config.json`` and
``configs/train_config.json``) in an ``AttrDict`` (reference:
distilcodec/utils/env.py:5-8, distilcodec/distil_codec.py:24-27).  We keep the
same on-disk JSON schema for drop-in compatibility but parse it into typed
dataclasses so that everything downstream is static/hashable and can be closed
over by jitted functions.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Sequence


class AttrDict(dict):
    """dict with attribute access, mirroring the reference's AttrDict."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def _tup(x) -> tuple:
    if isinstance(x, (list, tuple)):
        return tuple(_tup(e) for e in x)
    return x


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Mel front-end config (reference: configs/model_config.json:13-23)."""

    sampling_rate: int = 24000
    segment_size: int = 72000
    num_mels: int = 128
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 12000.0
    fmax_loss: float | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "SpecConfig":
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """ConvNeXt-V2 encoder config (reference: configs/model_config.json:24-40,
    distilcodec/models/encoders.py:7-61)."""

    input_channels: int = 128
    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (256, 512, 768, 1024)
    drop_path_rate: float = 0.2
    layer_scale_init_value: float = 1e-6
    kernel_size: int = 7

    @classmethod
    def from_dict(cls, d: dict) -> "EncoderConfig":
        d = {k: _tup(v) for k, v in d.items() if k in _field_names(cls)}
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """HiFiGAN generator config (reference: configs/model_config.json:41-84,
    distilcodec/models/generators.py:28-116)."""

    hop_length: int = 256
    upsample_rates: tuple = (8, 4, 2, 2, 2)
    upsample_kernel_sizes: tuple = (16, 12, 4, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 1024
    upsample_initial_channel: int = 1024
    use_template: bool = False
    pre_conv_kernel_size: int = 13
    post_conv_kernel_size: int = 13

    @classmethod
    def from_dict(cls, d: dict) -> "DecoderConfig":
        d = {k: _tup(v) for k, v in d.items() if k in _field_names(cls)}
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """GRFVQ quantizer config (reference: configs/model_config.json:85-104,
    distilcodec/vector_quantization/grfvq.py:27-103).

    ``quantizer_type`` selects 'grvq' (default) or 'grfsq'; the reference pops
    and ignores it, always building GRVQ (distil_codec.py:49-53) — we honor it.
    """

    quantizer_type: str = "grvq"
    input_dim: int = 1024
    n_groups: int = 1
    n_codebooks: int = 1  # residual layers (R)
    codebook_size: int = 32768
    codebook_dim: int = 3584
    levels: tuple = (8, 5, 5, 5)  # FSQ variant only
    downsample_factor: tuple = (1,)
    downsample_dims: tuple | None = None
    ema_decay: float = 0.8
    codebook_diversity_loss_weight: float = 1.0
    codebook_diversity_temperature: float = 100.0
    commitment_weight: float = 1.0
    threshold_ema_dead_code: float = 0.0
    kmeans_init: bool = False
    kmeans_iters: int = 10
    eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "QuantizerConfig":
        d = {k: _tup(v) for k, v in d.items() if k in _field_names(cls)}
        return cls(**d)

    @property
    def dim_per_group(self) -> int:
        ds_dims = self.downsample_dims
        inner = ds_dims[-1] if ds_dims else self.input_dim
        assert inner % self.n_groups == 0
        return inner // self.n_groups

    @property
    def total_downsample(self) -> int:
        out = 1
        for f in self.downsample_factor:
            out *= f
        return out


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Full model config — mirrors configs/model_config.json."""

    spec: SpecConfig
    encoder: EncoderConfig
    decoder: DecoderConfig
    quantizer: QuantizerConfig
    teacher_quantizer: QuantizerConfig | None = None
    token_id_offset: int = 0
    base_model: str = ""
    descriminators: Any = None  # raw dict; typed per-discriminator at build time
    raw: Any = None  # the original JSON dict, for round-tripping

    @classmethod
    def from_dict(cls, d: dict) -> "CodecConfig":
        return cls(
            spec=SpecConfig.from_dict(d["spec_transform"]),
            encoder=EncoderConfig.from_dict(d["encoder"]),
            decoder=DecoderConfig.from_dict(d["decoder"]),
            quantizer=QuantizerConfig.from_dict(d["quantizer"]),
            teacher_quantizer=(
                QuantizerConfig.from_dict(d["teacher_quantizer"])
                if "teacher_quantizer" in d
                else None
            ),
            token_id_offset=d.get("token_id_offset", 0),
            base_model=d.get("base_model", ""),
            descriminators=d.get("descriminators"),
            raw=d,
        )

    @classmethod
    def from_json(cls, path: str) -> "CodecConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


@dataclasses.dataclass(frozen=True)
class AdamConfig:
    """Optimizer config (reference: configs/train_config.json:2-8)."""

    learning_rate: float = 2e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    lr_decay: float = 0.98
    weight_decay: float = 1e-3

    @classmethod
    def from_dict(cls, d: dict) -> "AdamConfig":
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training config — mirrors configs/train_config.json."""

    adam: AdamConfig = AdamConfig()
    training_epochs: int = 50
    checkpoint_interval: int = 1000
    validation_interval: int = 2000
    accumulation_steps: int = 1
    summary_interval: int = 10
    stdout_interval: int = 10
    num_ckpt_keep: int = 30
    fine_tuning: bool = False
    num_gpus: int = 8  # kept for schema parity; means "num chips" here
    batch_size: int = 152
    seed: int = 1234
    sampling_rate: int = 24000
    codebook_loss_lambda: float = 1.0
    commitment_loss_lambda: float = 0.25
    num_workers: int = 4
    mels_path: str | None = None
    save_path: str = "./checkpoints"
    training_files_path: Any = None
    validation_files_path: Any = None
    distill: Any = None
    wandb: Any = None
    # framework extension (not in the reference's train_config.json):
    # discriminator conv compute dtype — None/fp32 = reference numerics,
    # "bfloat16" halves disc activation memory and doubles MXU rate
    # (DESIGN.md "Training memory"; Trainer.disc_dtype)
    disc_dtype: str | None = None
    # exact conv lowerings for training memory/lane utilization (both are
    # value- and gradient-exact; see DESIGN.md "Training memory"):
    # grouped_conv="dense" lowers the MSD grouped convs to masked
    # block-diagonal dense (kills the batch-minor padded gradient buffers);
    # msstft_freq_pack=4 packs MS-STFT frequencies into lanes (the
    # 32-channel convs otherwise tile-pad their gradients ~5x).  Threaded as
    # module attributes through Discriminators (instance-scoped; the
    # DISTILCODEC_GROUPED_CONV / DISTILCODEC_MSSTFT_PACK env vars remain
    # process-wide fallbacks for instances that don't set them).
    grouped_conv: str | None = None
    # int p: per-conv freq->lane packing; "chain": the r4 chain-packed stack
    # (activations stay packed across all six convs — no per-conv relayouts;
    # see msstftd.DiscriminatorSTFT.freq_pack)
    msstft_freq_pack: int | str = 0
    # run real+fake through each discriminator family as one concatenated
    # batch (bit-identical; half the conv programs per D phase — the
    # spectral-norm MSD scale keeps its sequential power-iteration calls).
    # True/"both" packs both phases; "d" packs only the D phase: the G phase
    # differentiates w.r.t. y_hat alone, so UNPACKED the real-side backward
    # is dead code XLA eliminates entirely, while packed the dx chain runs
    # for the real rows too (their FM-loss cotangents are nonzero; the
    # gradient only dies at the constant y) — packing there buys scheduling
    # but pays a full extra half-batch backward.
    # See training.train.Discriminators.batch_pack.
    disc_batch_pack: bool | str = False
    # generator (encoder+VQ-projections+decoder) conv compute dtype for the
    # TRAIN step — None/fp32 = round-1 numerics; "bfloat16" is the TPU analog
    # of the torch lineage training the generator under autocast(bf16)
    # (the reference's own demo encodes with enable_bfloat16=True,
    # distil_codec.py:701).  Params, VQ distance/EMA, losses and the returned
    # waveform stay fp32 (codec.DistilCodecModule compute_dtype semantics).
    gen_dtype: str | None = None
    # rematerialize decoder resblocks in the train forward (the reference's
    # torch.utils.checkpoint, generators.py:132-137).  Off trades HBM for
    # the recomputed resblock forwards in the backward pass — viable once
    # disc_dtype/grouped_conv/msstft_freq_pack have freed the memory.
    # Besides True/False, a comma stage list ("4" = only the final C=32
    # stage, whose activations are the longest) remats a subset — the
    # targeted large-batch memory squeeze (models.generator._remat_stage).
    gen_remat: bool | str = True

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        d = dict(d)
        if "adam" in d:
            d["adam"] = AdamConfig.from_dict(d["adam"])
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def _field_names(cls) -> set:
    return {f.name for f in dataclasses.fields(cls)}


def load_model_config(path: str) -> CodecConfig:
    return CodecConfig.from_json(path)


def load_train_config(path: str) -> TrainConfig:
    return TrainConfig.from_json(path)
