"""DistilCodec facade: the user-facing end-to-end API.

Drop-in behavioral twin of the reference ``DistilCodec`` class
(distilcodec/distil_codec.py:29-654): same construction from
``model_config.json``, same ``from_pretrained`` on reference ``g_*`` torch
checkpoints, same encode/decode/token surfaces and length bookkeeping.

TPU-first differences (behavior-preserving):
* the whole encode path (mel -> encoder -> VQ) and decode path (codebook
  gather -> upsample -> generator) are each ONE jitted device program — there
  is no CPU STFT round-trip (the reference forces its STFT to CPU,
  mel_spec.py:39) and no per-batch-element device->host slicing inside the
  hot path;
* jit caches compile per input shape; ``pad_to_multiple`` can bucket audio
  lengths to bound recompiles (off by default to match reference padding
  semantics bit-for-bit — the reference pads to the batch max, which affects
  trailing token ids).

Known reference bug NOT replicated: ``decode_from_codes_batch`` builds a
(batch, 1, L, 1) tensor whose dim 0 is consumed as the *group* axis by
``grvq.get_output_from_indices`` (distil_codec.py:620-630 vs grfvq.py:141-146
+ residual_vq.py:298), so only the first sequence decodes and the rest come
back empty.  Ours batches along the batch axis properly; the zero-padding of
short sequences with code id 0 (a real code) is kept, as documented there.
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import re
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .config import CodecConfig, load_model_config
from .dsp.mel import LogMelSpectrogram
from .llm_bridge import (
    audio_tokenize,
    construct_audio_code,
    get_codebook,
    llm_token_expanding,
    reset_codebook_embeddings,
)
from .models.encoder import ConvNeXtEncoder
from .models.generator import HiFiGANGenerator
from .quantization.grvq import DownsampleGRVQ, GRVQResult
from .utils import audio_io


class DistilCodecModule(nn.Module):
    """Encoder + quantizer + generator composition (jittable core).

    ``compute_dtype=jnp.bfloat16`` runs the conv stacks in bf16 with fp32
    params/accumulation — the TPU analog of the reference's autocast(bf16)
    on encode/decode (distil_codec.py:550, :590) — while the VQ nearest-
    neighbor search always stays fp32 (vector_quantize_pytorch.py:462-473).
    """

    cfg: CodecConfig
    only_quantizer: bool = False
    compute_dtype: jnp.dtype | None = None
    # remat decoder resblocks in training forwards: True/False or a comma
    # stage list like "4" (see HiFiGANGenerator.remat)
    gen_remat: bool | str = True
    # per-instance VQ nearest-neighbor search mode (None -> the
    # DISTILCODEC_VQ_PRECISION env fallback); lets two codecs with different
    # VQ precisions coexist in one process (quantization.vq.vq_search_mode)
    vq_search_mode: str | None = None

    def setup(self):
        cfg = self.cfg
        if not self.only_quantizer:
            self.encoder = ConvNeXtEncoder(
                cfg.encoder, dtype=self.compute_dtype, name="encoder"
            )
            self.generator = HiFiGANGenerator(
                cfg.decoder,
                dtype=self.compute_dtype,
                remat=self.gen_remat,
                name="generator",
            )
        # quantizer_type selects GRVQ (default) or the FSQ variant.  NOTE the
        # reference pops the key and unconditionally builds GRVQ
        # (distil_codec.py:49-53); we honor an explicit 'grfsq'.
        if cfg.quantizer.quantizer_type == "grfsq":
            from .quantization.fsq import DownsampleGRFSQ

            self.quantizer = DownsampleGRFSQ(
                cfg.quantizer, dtype=self.compute_dtype, name="quantizer"
            )
        else:
            self.quantizer = DownsampleGRVQ(
                cfg.quantizer,
                dtype=self.compute_dtype,
                search_mode=self.vq_search_mode,
                name="quantizer",
            )
        self.spec_transform = LogMelSpectrogram(
            sample_rate=cfg.spec.sampling_rate,
            n_fft=cfg.spec.n_fft,
            win_length=cfg.spec.win_size,
            hop_length=cfg.spec.hop_size,
            n_mels=cfg.spec.num_mels,
            f_min=cfg.spec.fmin,
            f_max=cfg.spec.fmax,
        )

    def mel(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, L) waveform -> (B, T, n_mels) log-mel (channels-last)."""
        mel = self.spec_transform(audio)  # (B, M, T)
        return jnp.swapaxes(mel, -1, -2)

    def encode_result(
        self,
        audio: jnp.ndarray,
        *,
        training: bool = False,
        update_ema: bool = False,
    ) -> GRVQResult:
        """(B, L) waveform -> GRVQResult."""
        mel = self.mel(audio)
        encoded = self.encoder(mel, training=training)
        return self.quantizer(
            encoded, training=training, update_ema=update_ema
        )

    def encode_codes(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, L) waveform -> indices (B, G*R, L_frames)."""
        mel = self.mel(audio)
        return self.quantizer.encode(self.encoder(mel))

    def _encode_from_mel(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) log-mel -> indices (B, G*R, T).  Used by the
        time-sharded halo path, which computes mel per shard."""
        return self.quantizer.encode(self.encoder(mel))

    def decode_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (G, B, L, R) -> waveform (B, hop*T)."""
        if self.cfg.quantizer.quantizer_type == "grfsq":
            g, b, l, r = codes.shape
            codes = jnp.transpose(codes, (1, 0, 3, 2)).reshape(b, g * r, l)
        feats = self.quantizer.decode(codes)
        return self.generator(feats)

    def decode_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """quantized features (B, T, C) -> waveform (B, hop*T)."""
        return self.generator(feats)

    def __call__(
        self, audio: jnp.ndarray, *, training: bool = False, update_ema: bool = False
    ):
        """Full round-trip: (B, L) waveform -> (reconstruction, GRVQResult)."""
        result = self.encode_result(
            audio, training=training, update_ema=update_ema
        )
        wave = self.generator(result.quantized, training=training)
        return wave, result


class DistilCodec:
    """User-facing codec (reference API: distil_codec.py:29-654)."""

    def _build_modules(self) -> None:
        """(Re)build the jittable modules for the current VQ search mode —
        instance state, so two codecs with different modes coexist in one
        process (the DISTILCODEC_VQ_PRECISION env var remains a process-wide
        fallback for instances that don't set a mode)."""
        self.module = DistilCodecModule(
            self.codec_config,
            only_quantizer=self._only_quantizer,
            vq_search_mode=self._vq_search_mode,
        )
        self.module_bf16 = DistilCodecModule(
            self.codec_config,
            only_quantizer=self._only_quantizer,
            compute_dtype=jnp.bfloat16,
            vq_search_mode=self._vq_search_mode,
        )

    def __init__(
        self,
        configs: dict | CodecConfig,
        is_debug: bool = False,
        only_quantizer: bool = False,
        variables: dict | None = None,
        seed: int = 0,
        vq_search_mode: str | None = None,
        pad_to_multiple: int | None = None,
    ):
        if isinstance(configs, dict):
            configs = CodecConfig.from_dict(configs)
        self.codec_config = configs
        # serving-shape bucketing (see preprocess_raw_audio_batch /
        # decode_from_codes): round one-shot batch widths up to a multiple of
        # this many SAMPLES so a sweep of distinct input lengths hits a
        # handful of compiled programs instead of one compile per length
        # (cold compiles through the TPU tunnel cost minutes, DESIGN.md).
        # May be flipped on/off at any time (host-side padding only).
        self.pad_to_multiple = pad_to_multiple
        self.is_debug = is_debug
        self.ckpt_step = 0
        self.g_ckpt_path = ""
        self.ngroups = configs.quantizer.n_groups
        self.nresiduals = configs.quantizer.n_codebooks
        self.hop_size = configs.spec.hop_size
        self.ds_factor = configs.quantizer.total_downsample
        self.tokens_id_offset = configs.token_id_offset
        self.spec_config = configs.spec

        self._only_quantizer = only_quantizer
        self._vq_search_mode = vq_search_mode
        self._build_modules()
        if variables is None:
            # init under jit: one compiled program instead of thousands of
            # eagerly-dispatched init ops (critical on remote-compile TPU)
            dummy = jnp.zeros((1, self.hop_size * 8 * self.ds_factor + 1))
            if only_quantizer:
                variables = jax.jit(
                    lambda r, x: self.module.init(
                        r, x, method=lambda m, y: m.quantizer(y)
                    )
                )(
                    jax.random.PRNGKey(seed),
                    jnp.zeros((1, 8, configs.quantizer.input_dim)),
                )
            else:
                variables = jax.jit(self.module.init)(
                    jax.random.PRNGKey(seed), dummy
                )
        self.variables = variables

        self._mesh = None
        self._codebook_tp = False
        self._build_jits()
        # token map is built lazily: it materializes the full codebook on host
        # (hundreds of MB over the device tunnel) and is only needed by the
        # token-annotation surfaces, not by encode/decode throughput paths.
        self._gr_audio_code2token = None

    def _build_jits(self):
        """(Re)build the jitted paths, optionally data-parallel over a mesh."""
        kw = {}
        batch_sharding = None
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # with codebook-TP active the variables keep their own placement
            # (codebook tables sharded along the model axis) — None =
            # "inherit from argument" in jit in_shardings
            replicated = (
                None if self._codebook_tp else NamedSharding(self._mesh, P())
            )
            batch_sharding = NamedSharding(self._mesh, P("data"))
            codes_sharding = NamedSharding(self._mesh, P(None, "data"))

        def _jits(mod):
            if self._mesh is None:
                return {
                    "encode": jax.jit(
                        lambda v, a: mod.apply(v, a, method="encode_result")
                    ),
                    "decode_codes": jax.jit(
                        lambda v, c: mod.apply(v, c, method="decode_codes")
                    ),
                    "decode_feats": jax.jit(
                        lambda v, f: mod.apply(v, f, method="decode_features")
                    ),
                    "roundtrip": jax.jit(lambda v, a: mod.apply(v, a)),
                }
            return {
                "encode": jax.jit(
                    lambda v, a: mod.apply(v, a, method="encode_result"),
                    in_shardings=(replicated, batch_sharding),
                ),
                "decode_codes": jax.jit(
                    lambda v, c: mod.apply(v, c, method="decode_codes"),
                    in_shardings=(replicated, codes_sharding),
                ),
                "decode_feats": jax.jit(
                    lambda v, f: mod.apply(v, f, method="decode_features"),
                    in_shardings=(replicated, batch_sharding),
                ),
                "roundtrip": jax.jit(
                    lambda v, a: mod.apply(v, a),
                    in_shardings=(replicated, batch_sharding),
                ),
            }

        if self._mesh is None:
            self._jit = {False: _jits(self.module), True: _jits(self.module_bf16)}
            self._jit_dp = None
        else:
            self._jit_dp = {
                False: _jits(self.module),
                True: _jits(self.module_bf16),
            }

    def _pick(self, enable_bfloat16: bool, kind: str, batch: int):
        """DP jit when the batch divides the data axis, else the plain jit."""
        if (
            self._jit_dp is not None
            and batch % self._mesh.shape["data"] == 0
        ):
            return self._jit_dp[bool(enable_bfloat16)][kind]
        return self._jit[bool(enable_bfloat16)][kind]

    def use_data_parallel(self, mesh) -> "DistilCodec":
        """Shard batched inference along the mesh's ``data`` axis (params
        replicated — BASELINE config 2's batched tokenization at scale).
        Batch sizes must divide the data-axis size.  Returns self."""
        self._mesh = mesh
        self._build_jits()
        return self

    def use_codebook_sharding(self, mesh, axis: str = "model") -> "DistilCodec":
        """Tensor-parallel VQ search (SURVEY §2.2 TP row): shard the (K, D)
        codebook tables along ``axis`` of ``mesh``.  Each device scores K/n
        codes; the global argmin combines per-shard (min, argmin) pairs with
        one tiny all-gather over ICI — the allreduce-argmin alternative to
        replicating the 470 MB table (the reference's hot loop is a fully
        replicated cdist, vector_quantize_pytorch.py:496).  Tie-breaking
        matches the replicated argmin (lowest global index), so token ids are
        identical (tests/test_codebook_tp.py).  Pass ``mesh=None`` to
        deactivate.  Activation is process-wide (it retraces the jitted
        paths); composable with ``use_data_parallel`` on a mesh that carries
        both axes.  Returns self."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.codebook_shard import set_codebook_sharding

        set_codebook_sharding(mesh, axis)
        self._codebook_tp = mesh is not None
        if mesh is not None:
            # physically distribute the big tables so dispatch doesn't reshard
            def place(path, leaf):
                name = getattr(path[-1], "key", str(path[-1]))
                if name in ("embed", "embed_avg") and leaf.ndim >= 2:
                    k_dim = leaf.ndim - 2  # (K, D) or (C, K, D)
                elif name == "cluster_size":
                    k_dim = leaf.ndim - 1  # (K,) or (C, K)
                else:
                    return jax.device_put(leaf, NamedSharding(mesh, P()))
                spec = [None] * leaf.ndim
                if leaf.shape[k_dim] % mesh.shape[axis] == 0:
                    spec[k_dim] = axis
                return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

            codebook = jax.tree_util.tree_map_with_path(
                place, self.variables["codebook"]
            )
            self.variables = dict(self.variables, codebook=codebook)
        self._build_jits()  # retrace so the TP search is picked up
        return self

    def fold_weight_norm(self) -> "DistilCodec":
        """Fold all (g, v) weight-norm pairs into plain weights — the
        reference's inference-export ``remove_weight_norm``
        (generators.py:149-155).  Numerically identical forward; the stored
        checkpoint becomes plain weights.  Returns self."""
        from .models.blocks import fold_weight_norm

        self.variables = dict(
            self.variables, params=fold_weight_norm(self.variables["params"])
        )
        return self

    def cache_int8_codebook(self, enable: bool = True) -> "DistilCodec":
        """Hoist the int8 codebook requantization out of the encode hot path.

        Computes per-row symmetric int8 tables + squared norms for every
        codebook ONCE and stores them beside the fp32 ``embed``
        (``embed_q``/``embed_qscale``/``embed_norm2`` in the codebook
        collection), then switches THIS instance's VQ search mode to
        ``int8_cached``: int8 MXU scoring (2x the bf16 rate, 4x less HBM
        traffic) + exact fp32 rescore of the top-16 candidates — identical
        scores to ``DISTILCODEC_VQ_PRECISION=int8``, none of its per-call
        requantization cost (the TODO.md "cached pre-quantized int8
        codebook" item).  Inference-only: re-run after any codebook mutation
        (``reset_codebook`` refreshes automatically; training EMA updates do
        NOT — drop the cache before training).  ``enable=False`` removes the
        tables and restores the default search.  Returns self."""
        from .quantization.vq import quantize_codebook_int8

        cb_state = jax.tree_util.tree_map(
            np.asarray, self.variables["codebook"]
        )
        grvq = cb_state["quantizer"]["grvq"]
        for g in range(self.ngroups):
            for r in range(self.nresiduals):
                layer = grvq[f"rvqs_{g}"][f"layers_{r}"]
                if enable:
                    eq, se, e2 = quantize_codebook_int8(layer["embed"])
                    layer["embed_q"] = eq
                    layer["embed_qscale"] = se
                    layer["embed_norm2"] = e2
                else:
                    for k in ("embed_q", "embed_qscale", "embed_norm2"):
                        layer.pop(k, None)
        self.variables = {
            "params": self.variables["params"],
            "codebook": jax.tree_util.tree_map(jnp.asarray, cb_state),
        }
        if enable:
            self._vq_search_mode = "int8_cached"
        elif self._vq_search_mode == "int8_cached":
            self._vq_search_mode = None
        self._build_modules()
        self._build_jits()  # retrace with/without the cached tables
        return self

    @property
    def gr_audio_code2token(self) -> dict:
        if self._gr_audio_code2token is None:
            self._gr_audio_code2token = self.construct_audio_code(
                self.tokens_id_offset
            )
        return self._gr_audio_code2token

    @gr_audio_code2token.setter
    def gr_audio_code2token(self, value):
        self._gr_audio_code2token = value

    # ------------------------------------------------------------------ load

    @classmethod
    def from_pretrained(
        cls,
        config_path: str,
        model_path: str,
        load_steps: int = -1,
        is_debug: bool = False,
        use_generator: bool = True,
        local_rank: int = 0,
    ) -> "DistilCodec":
        """Load a reference torch ``g_*`` checkpoint (distil_codec.py:77-97)."""
        from .utils.torch_import import (
            convert_codec_checkpoint,
            load_torch_checkpoint,
        )

        cfg = load_model_config(config_path)
        ckpt = load_torch_checkpoint(model_path)
        codec = cls(cfg, is_debug=is_debug)
        converted = convert_codec_checkpoint(ckpt, cfg)
        variables = jax.tree_util.tree_map(jnp.asarray, converted)
        # keep randomly-initialized generator if checkpoint lacks it
        params = dict(variables["params"])
        if "generator" not in params:
            params["generator"] = codec.variables["params"]["generator"]
        codec.variables = {"params": params, "codebook": variables["codebook"]}
        codec.g_ckpt_path = model_path
        codec.ckpt_step = -1
        codec._gr_audio_code2token = None  # rebuild lazily from new codebook
        return codec

    # ----------------------------------------------------------- preprocess

    def _lengths(self, n_samples: int) -> tuple[int, int]:
        n_hop_length = n_samples // (self.hop_size * self.ds_factor)
        gen_time_length = (n_samples // self.hop_size) * (self.hop_size + 1)
        return n_hop_length, gen_time_length

    def preprocess_raw_audio_batch(self, audio_data_info_list: list):
        """[(audio array, sr), ...] -> (audios, gen_time_lengths, n_hop_lengths)

        Replicates reference padding semantics exactly: resample to target sr,
        mono mean, then pad every item with (1, max_len - len) zeros — note the
        1-sample LEFT pad (distil_codec.py:133-136), which shifts all frames
        and DOES affect token ids.
        """
        audio_list, audio_lengths, n_hop_lengths, gen_lengths = [], [], [], []
        max_length = 0
        for audio, sr in audio_data_info_list:
            audio = np.asarray(audio, dtype=np.float32)
            if audio.size == 0:
                raise ValueError("preprocess: got empty audio")
            if sr != self.spec_config.sampling_rate:
                audio = audio_io.resample(
                    audio, sr, self.spec_config.sampling_rate
                )
            if audio.ndim > 1:
                if audio.shape[0] > 1:
                    audio = audio.mean(axis=0)
                else:
                    audio = audio[0]
            max_length = max(max_length, audio.shape[-1])
            nh, gt = self._lengths(audio.shape[-1])
            audio_list.append(audio)
            audio_lengths.append(audio.shape[-1])
            n_hop_lengths.append(nh)
            gen_lengths.append(gt)

        width = max_length + 1
        if self.pad_to_multiple:
            # serving bucketing: the batch keeps the reference's semantics
            # (zero right-pad, tokens sliced to each item's true n_hop_len —
            # exactly what padding to the batch max already does,
            # distil_codec.py:119/:566-570) but the PROGRAM SHAPE is the
            # bucket boundary, so 20 distinct lengths compile a handful of
            # programs instead of 20.  Extra zero-pad beyond the batch max
            # can flip a few TRAILING token ids (non-causal encoder sees
            # log-mel-of-silence right-context) — measured profile in
            # tests/test_pad_to_multiple.py and the README serving note.
            m = int(self.pad_to_multiple)
            width = -(-width // m) * m
        batch = np.zeros((len(audio_list), width), dtype=np.float32)
        for i, audio in enumerate(audio_list):
            batch[i, 1 : 1 + audio_lengths[i]] = audio
        return batch, gen_lengths, n_hop_lengths

    def preprocess_audio_batch(self, audio_pathes: list):
        """Load from disk with the reference's noise fallback on decode errors
        (distil_codec.py:147-198)."""
        items = []
        for p in audio_pathes:
            try:
                audio, sr = audio_io.load_wav(
                    p, sr=self.spec_config.sampling_rate
                )
            except Exception:
                print(f"Error on audio: {p}")
                audio = (
                    np.random.normal(size=(self.spec_config.sampling_rate,))
                    * 0.05
                ).astype(np.float32)
                sr = self.spec_config.sampling_rate
            items.append((audio, sr))
        return self.preprocess_raw_audio_batch(items)

    # ----------------------------------------------------------------- API

    def encode(
        self,
        audio_pathes: list,
        enable_bfloat16: bool = False,
        raw_audio: bool = False,
    ):
        """Audio -> GRVQResult (+ per-item token lists), mirrors
        distil_codec.py:545-573.  Returns (result, codes_list, x_pjt_in_list,
        quantized_fup_list, gen_time_lengths, n_hop_lengths)."""
        if raw_audio:
            audios, gen_lengths, n_hop_lengths = self.preprocess_raw_audio_batch(
                audio_pathes
            )
        else:
            audios, gen_lengths, n_hop_lengths = self.preprocess_audio_batch(
                audio_pathes
            )
        result: GRVQResult = self._pick(
            enable_bfloat16, "encode", audios.shape[0]
        )(self.variables, jnp.asarray(audios))
        codes = np.asarray(result.codes)  # (G, B, L, R)
        x_pjt = np.asarray(result.x_pjt_in)  # (B, L, G*Dc)
        fup = np.asarray(result.quantized_fup)

        codes_list, pjt_list, fup_list = [], [], []
        for b, hop_len in enumerate(n_hop_lengths):
            c = codes[:, b, :hop_len, :]  # (G, hop_len, R)
            seq = np.transpose(c, (1, 0, 2)).reshape(hop_len, -1).reshape(-1)
            codes_list.append(
                audio_tokenize(
                    self.gr_audio_code2token,
                    seq.tolist(),
                    n_groups=codes.shape[0],
                    n_residual=codes.shape[-1],
                )
            )
            # the reference's (L, D) -> (2L, D/2) "half-dim" reshape
            # (distil_codec.py:566-570)
            pjt_list.append(
                x_pjt[b, :hop_len].reshape(hop_len, 2, -1).reshape(hop_len * 2, -1)
            )
            fup_list.append(
                fup[b, :hop_len].reshape(hop_len, 2, -1).reshape(hop_len * 2, -1)
            )
        return result, codes_list, pjt_list, fup_list, gen_lengths, n_hop_lengths

    def audio_tokenize(self, codes: list, n_groups: int, n_residual: int):
        return audio_tokenize(
            self.gr_audio_code2token, codes, n_groups, n_residual
        )

    def encode_to_token_ids(
        self, audio_pathes: list, raw_audio: bool = False, plus_offset: bool = True
    ) -> list[list[int]]:
        """Convenience: audio -> plain int token ids per item (the
        decode_audio/demo flow, distil_codec.py:687-708)."""
        _, codes_list, *_ = self.encode(audio_pathes, raw_audio=raw_audio)
        out = []
        for toks in codes_list:
            ids = [t["in_codebook_id"] for t in toks]
            if plus_offset:
                ids = [i + self.tokens_id_offset for i in ids]
            out.append(ids)
        return out

    def decode_from_codes(
        self,
        codes: list,
        minus_token_offset: bool = True,
        enable_bfloat16: bool = False,
    ) -> np.ndarray:
        """Flat token list -> waveform (1, 1, L·hop·ds) — distil_codec.py:581-594."""
        if minus_token_offset:
            codes = [c - self.tokens_id_offset for c in codes]
        self._validate_codes(codes)
        arr = np.asarray(codes, dtype=np.int32).reshape(1, 1, -1, 1)
        n_true = arr.shape[2]
        if self.pad_to_multiple:
            # bucket the decode program shape too: pad frames with code id 0
            # (a REAL code — the reference's own batch-decode padding,
            # distil_codec.py:620-630) and slice the waveform back to the
            # true frame count.  The decoder's non-causal convs see the
            # padded frames as right-context, so the last ~receptive-field
            # samples differ slightly from the unbucketed decode (same
            # trade the reference makes padding shorter batch items).
            fm = max(1, int(self.pad_to_multiple) // (self.hop_size * self.ds_factor))
            pad = (-n_true) % fm
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((1, 1, pad, 1), np.int32)], axis=2
                )
        wave = self._pick(enable_bfloat16, "decode_codes", 1)(
            self.variables, jnp.asarray(arr)
        )
        wave = np.asarray(wave)[:, None, : n_true * self.hop_size * self.ds_factor]
        return wave

    def decode_from_codes_batch(
        self,
        codes_list: list,
        minus_token_offset: bool = True,
        enable_bfloat16: bool = False,
    ) -> list[np.ndarray]:
        """Batched decode.  Pads short sequences with code id 0 (a real code —
        padding frames decode to garbage the caller must trim, kept from the
        reference distil_codec.py:620-625)."""
        if not codes_list:
            return []
        if minus_token_offset:
            codes_list = [
                [c - self.tokens_id_offset for c in codes] for codes in codes_list
            ]
        for codes in codes_list:
            self._validate_codes(codes)
        max_len = max(len(c) for c in codes_list)
        batch = np.zeros((1, len(codes_list), max_len, 1), dtype=np.int32)
        for i, codes in enumerate(codes_list):
            batch[0, i, : len(codes), 0] = np.asarray(codes, dtype=np.int32)
        waves = self._pick(enable_bfloat16, "decode_codes", len(codes_list))(
            self.variables, jnp.asarray(batch)
        )
        waves = np.asarray(waves)
        return [waves[i : i + 1, None, :] for i in range(len(codes_list))]

    def _validate_codes(self, codes) -> None:
        """Out-of-range code ids would otherwise gather NaN rows silently
        (jnp OOB gather fill); raise a clear error instead (the reference
        dies with a CUDA device assert here)."""
        K = self.codec_config.quantizer.codebook_size
        arr = np.asarray(codes)
        if arr.size == 0:
            raise ValueError("decode_from_codes: empty code sequence")
        bad = (arr < 0) | (arr >= K)
        if bad.any():
            first = arr[bad].flat[0]
            raise ValueError(
                f"code id {int(first)} out of range [0, {K}) — "
                f"did you forget minus_token_offset (offset "
                f"{self.tokens_id_offset})?"
            )

    def decode_from_features(
        self, quantized_features, enable_bfloat16: bool = False
    ) -> np.ndarray:
        """(B, T, C) or reference-layout (B, C, T) features -> waveform."""
        feats = jnp.asarray(quantized_features)
        if feats.shape[-1] != self.codec_config.quantizer.input_dim:
            feats = jnp.swapaxes(feats, -1, -2)
        wave = self._pick(enable_bfloat16, "decode_feats", feats.shape[0])(
            self.variables, feats
        )
        return np.asarray(wave)[:, None, :]

    def forward(self, audio_pathes: list):
        """Round-trip on files (distil_codec.py:518-530)."""
        audios, gen_lengths, n_hop_lengths = self.preprocess_audio_batch(
            audio_pathes
        )
        wave, _ = self._pick(False, "roundtrip", audios.shape[0])(
            self.variables, jnp.asarray(audios)
        )
        return np.asarray(wave)[:, None, :], audios, gen_lengths, n_hop_lengths

    __call__ = forward

    def save_wav(
        self,
        audio_gen_batch: np.ndarray,
        nhop_lengths,
        audio_names=None,
        save_path="./log",
        name_tag="default",
    ):
        """(B, 1, L) batch -> wav files, trimming to per-item lengths
        (distil_codec.py:640-654)."""
        use_org_name = audio_names is not None and len(audio_names) == len(
            nhop_lengths
        )
        os.makedirs(save_path, exist_ok=True)
        audio_gen_batch = np.asarray(audio_gen_batch)
        out_paths = []
        for i in range(audio_gen_batch.shape[0]):
            audio = audio_gen_batch[i, 0, : nhop_lengths[i]]
            name = f"{name_tag}.wav" if not use_org_name else f"{audio_names[i]}"
            path = os.path.join(save_path, name)
            audio_io.save_wav(path, audio, self.spec_config.sampling_rate)
            out_paths.append(path)
        return out_paths

    # ------------------------------------------------------------ codebook

    @property
    def codebooks(self) -> np.ndarray:
        """(G, R, K, D) codebook array from current variables."""
        cb = self.variables["codebook"]["quantizer"]["grvq"]
        groups = []
        for g in range(self.ngroups):
            layers = cb[f"rvqs_{g}"]
            groups.append(
                np.stack(
                    [
                        np.asarray(layers[f"layers_{r}"]["embed"])
                        for r in range(self.nresiduals)
                    ]
                )
            )
        return np.stack(groups)

    def construct_audio_code(self, tokens_id_offset: int = 0) -> dict:
        return construct_audio_code(self.codebooks, tokens_id_offset)

    def get_codebook(self, is_one_codebook: bool = False):
        return get_codebook(
            self.codebooks, self.gr_audio_code2token, is_one_codebook
        )

    def llm_token_expanding(
        self,
        llm_path: str,
        saved_path: str,
        is_test: bool = False,
        is_random_init: bool = False,
        audio_scale_factor: float = 100.0,
    ):
        return llm_token_expanding(
            self.codebooks,
            self.gr_audio_code2token,
            llm_path,
            saved_path,
            self.tokens_id_offset,
            self.codec_config.quantizer.codebook_dim,
            is_random_init=is_random_init,
            audio_scale_factor=audio_scale_factor,
            is_test=is_test,
        )

    def reset_codebook(self, unique_indice, save_path: str | None, topK: int = 6):
        """Re-seed unused codes (distil_codec.py:434-486)."""
        if isinstance(unique_indice, str):
            with open(unique_indice) as f:
                unique_codes = json.load(f)
        elif isinstance(unique_indice, dict):
            unique_codes = unique_indice
        else:
            raise ValueError("param unique_indice is not [str|dict]")

        cb_state = jax.tree_util.tree_map(
            np.asarray, self.variables["codebook"]
        )
        for i, gr_name in enumerate(unique_codes.keys()):
            cur_group = i // self.ngroups
            cur_residual = i % self.nresiduals
            layer = cb_state["quantizer"]["grvq"][f"rvqs_{cur_group}"][
                f"layers_{cur_residual}"
            ]
            new_cb = reset_codebook_embeddings(
                layer["embed"], unique_codes[gr_name], top_k=topK
            )
            layer["embed"] = new_cb.astype(np.float32)
            if "embed_q" in layer:  # keep the int8 cache coherent
                from .quantization.vq import quantize_codebook_int8

                eq, se, e2 = quantize_codebook_int8(layer["embed"])
                layer["embed_q"], layer["embed_qscale"] = eq, se
                layer["embed_norm2"] = e2
        self.variables = {
            "params": self.variables["params"],
            "codebook": jax.tree_util.tree_map(jnp.asarray, cb_state),
        }
        self._gr_audio_code2token = None  # rebuild lazily from new codebook
        if save_path is not None:
            os.makedirs(save_path, exist_ok=True)
            self.save_checkpoint(
                f"{save_path}/g_{self.ckpt_step:08d}", num_ckpt_keep=5
            )

    # ---------------------------------------------------------- checkpoints

    def save_checkpoint(self, filepath: str, num_ckpt_keep: int = 5):
        """Write a reference-compatible torch ``g_*`` pickle
        (distil_codec.py:494-502's keep-last-N pruning included)."""
        from .utils.torch_export import export_codec_checkpoint

        m = re.match(r"(do|g)_\d+", pathlib.Path(filepath).name)
        if m is None:
            raise ValueError(
                f"save_checkpoint: filepath basename {pathlib.Path(filepath).name!r} "
                "must match the reference naming g_<step>/do_<step> "
                "(e.g. 'g_00204000') so keep-last-N pruning can scan siblings"
            )
        name = m.group(1)
        ckpts = sorted(pathlib.Path(filepath).parent.glob(f"{name}_*"))
        if len(ckpts) > num_ckpt_keep:
            for c in ckpts[:-num_ckpt_keep]:
                os.remove(c)
        export_codec_checkpoint(self.variables, self.codec_config, filepath)

    @staticmethod
    def load_checkpoint(filepath: str, device=None):
        from .utils.torch_import import load_torch_checkpoint

        assert os.path.isfile(filepath)
        return load_torch_checkpoint(filepath)

    @staticmethod
    def scan_checkpoint(cp_dir: str, prefix: str, target_steps: int = -1):
        """Newest (or exact-step) checkpoint path (distil_codec.py:504-516)."""
        pattern = os.path.join(cp_dir, prefix + "????????")
        cp_list = glob.glob(pattern)
        if len(cp_list) == 0:
            return None
        if target_steps != -1:
            for p in cp_list:
                if p.endswith(str(target_steps)):
                    return p
        return sorted(cp_list)[-1]


def decode_audio(
    codec: DistilCodec, audio_tsr, target_sr: int = 24000, plus_offset: bool = True
) -> list[int]:
    """Raw audio -> token id list (reference: distil_codec.py:687-708)."""
    audio = np.asarray(audio_tsr, dtype=np.float32)
    if audio.ndim > 1:
        audio = audio[0]
    _, codes_list, *_ = codec.encode([(audio, target_sr)], raw_audio=True)
    ids = [t["in_codebook_id"] for t in codes_list[0]]
    if plus_offset:
        ids = [i + codec.tokens_id_offset for i in ids]
    return ids


def demo_for_generate_audio_codes(
    codec: DistilCodec,
    audio_path: str,
    target_sr: int = 24000,
    plus_llm_offset: bool = True,
) -> list[int]:
    """Audio file -> token ids (reference: distil_codec.py:711-727)."""
    audio_tsr, _, _ = audio_io.load_and_resample_audio(audio_path, target_sr)
    return decode_audio(codec, audio_tsr, target_sr, plus_llm_offset)
