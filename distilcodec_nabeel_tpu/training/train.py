"""The GAN training loop the reference implies but does not ship.

The reference repo carries every training component (three discriminator
families, losses, EMA codebook, dataset, AdamW hyperparams in
train_config.json) but no train.py (SURVEY §1).  This module supplies it,
TPU-first:

* one jitted ``train_step`` doing the D update then the G update (HiFiGAN
  two-forward ordering), with the EMA codebook transition inside the G forward
  exactly once per step — as a functional state update, not a buffer mutation
  (reference semantics: vector_quantize_pytorch.py:508-531);
* data parallelism by sharding the batch along a ``data`` mesh axis with
  NamedSharding — the EMA count/sum reductions and gradient means are written
  as global reductions so GSPMD inserts the ICI all-reduces (the reference's
  explicit NCCL all_reduce calls, dist_utils.py:18, vq:518/:523);
* AdamW(2e-4, betas .5/.9, wd 1e-3) with 0.98/epoch decay
  (train_config.json:2-8).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..codec import DistilCodecModule
from ..config import CodecConfig, TrainConfig
from ..models.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from ..models.msstftd import MultiScaleSTFTDiscriminator
from .losses import (
    codebook_metrics,
    discriminator_loss,
    feature_loss,
    generator_loss,
    mel_l1_loss,
)


class Discriminators(nn.Module):
    """MPD + MSD + MS-STFT under one parameter tree, configured from
    model_config.json's ``descriminators`` section.

    ``dtype=jnp.bfloat16`` runs every discriminator conv in bf16 (params and
    spectral-norm math stay fp32; the MS-STFT's STFT stays fp32) — halves the
    conv activation/gradient memory that dominates the train step's HBM and
    doubles the MXU rate.  Default fp32 = the reference's numerics (torch
    trains discriminators outside the autocast region).

    ``grouped_conv`` / ``msstft_freq_pack`` are the exact-lowering recipe
    switches (TrainConfig docstrings), threaded as module attributes so two
    Trainers with different recipes coexist in one process; ``None`` falls
    back to the DISTILCODEC_GROUPED_CONV / DISTILCODEC_MSSTFT_PACK env
    overrides."""

    cfg: CodecConfig
    dtype: Any = None
    grouped_conv: str | None = None
    msstft_freq_pack: int | str | None = None
    # run real+fake through each family as ONE concatenated batch (except
    # the spectral-norm MSD scale whose power-iteration sequence must be
    # preserved): bit-identical values, half the conv programs per D phase
    # (see MultiPeriodDiscriminator.batch_pack)
    batch_pack: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, *, update_stats: bool = False):
        if self.dtype is not None:
            y = y.astype(self.dtype)
            y_hat = y_hat.astype(self.dtype)
        d = self.cfg.descriminators or {}
        mpd_cfg = d.get("MultiPeriodDiscriminator", {})
        msd_cfg = d.get("MultiScaleDiscriminator", {})
        msstft_cfg = d.get("MultiScaleSTFTDiscriminator", {})

        mpd = MultiPeriodDiscriminator(
            periods=tuple(mpd_cfg.get("periods", (2, 3, 5, 7, 11))),
            kernel_size=mpd_cfg.get("kernal_size", 5),
            stride=mpd_cfg.get("stride", 3),
            batch_pack=self.batch_pack,
            name="mpd",
        )
        # MSD uses the torch-default architecture (the reference's config
        # branch is inverted/dead — descriminators.py:273-282) unless the
        # framework-extension key ``override_layers`` asks for a structurally
        # identical small stack (tests / multi-chip dryrun — the full
        # 1024-ch k=41 stack is a CPU-mesh compile-time hazard, VERDICT.md).
        override = msd_cfg.get("override_layers")
        msd = MultiScaleDiscriminator(
            layers=tuple(tuple(l) for l in override) if override else None,
            grouped_conv_lowering=self.grouped_conv,
            batch_pack=self.batch_pack,
            name="msd",
        )
        msstft = MultiScaleSTFTDiscriminator(
            filters=msstft_cfg.get("filters", 32),
            n_ffts=tuple(msstft_cfg.get("n_ffts", (1024, 2048, 512, 256, 128))),
            hop_lengths=tuple(msstft_cfg.get("hop_lengths", (256, 512, 128, 64, 32))),
            win_lengths=tuple(msstft_cfg.get("win_lengths", (1024, 2048, 512, 256, 128))),
            freq_pack=self.msstft_freq_pack,
            name="msstft",
        )

        p_rs, p_gs, p_fr, p_fg = mpd(y, y_hat)
        s_rs, s_gs, s_fr, s_fg = msd(y, y_hat, update_stats=update_stats)
        if self.batch_pack:
            # MS-STFT is stateless: one concatenated pass, split after.
            # Chain-packed fmaps are (array, scale) pairs — slice the array.
            def _fm_slice(f, sl):
                return (f[0][sl], f[1]) if isinstance(f, tuple) else f[sl]

            B = y.shape[0]
            st_all, st_fm = msstft(jnp.concatenate([y, y_hat], axis=0))
            st_r = [l[:B] for l in st_all]
            st_g = [l[B:] for l in st_all]
            st_fr = [[_fm_slice(f, slice(None, B)) for f in fm] for fm in st_fm]
            st_fg = [[_fm_slice(f, slice(B, None)) for f in fm] for fm in st_fm]
        else:
            st_r, st_fr = msstft(y)
            st_g, st_fg = msstft(y_hat)
        return {
            "mpd": (p_rs, p_gs, p_fr, p_fg),
            "msd": (s_rs, s_gs, s_fr, s_fg),
            "msstft": (st_r, st_g, st_fr, st_fg),
        }


def _check_dtype(field: str, value: str | None) -> str | None:
    """Validate a compute-dtype config string, naming the field on error
    (a typo like --gen-dtype fp16 otherwise surfaces as a bare jnp.dtype
    TypeError with no hint which knob was bad)."""
    allowed = (None, "", "float32", "fp32", "bfloat16", "bf16")
    if value not in allowed:
        raise ValueError(
            f"{field}={value!r}: expected one of "
            "None/'float32'/'fp32'/'bfloat16'/'bf16' "
            "(fp16 is not a supported TPU compute dtype here)"
        )
    if value in ("float32", "fp32"):
        return None  # fp32 is the default compute mode
    return value


@flax.struct.dataclass
class CodecTrainState:
    step: jnp.ndarray
    gen_params: Any
    codebook: Any
    gen_opt_state: Any
    disc_params: Any
    spectral: Any
    disc_opt_state: Any


@dataclasses.dataclass
class Trainer:
    """Builds jitted train/eval steps for a codec + discriminator pair."""

    codec_cfg: CodecConfig
    train_cfg: TrainConfig
    steps_per_epoch: int = 1000
    mel_loss_weight: float = 45.0  # HiFiGAN-lineage weight (see losses.py)
    # compute dtype for the discriminator convs: None = fp32 (reference
    # numerics — torch trains discriminators outside autocast); "bfloat16"
    # halves the conv activation/gradient buffers that dominate step HBM
    # (batch 19x72000 measured 18.1 GB of HLO temps in fp32, OOM on 16 GB
    # v5e — the worst single buffer a 6.7x-tile-padded MSD grouped-conv
    # gradient) and doubles the conv MXU rate.
    disc_dtype: str | None = None
    # compute dtype for the GENERATOR stack (encoder convs, VQ projections,
    # decoder convs) in the train step: None = fp32 (round-1 numerics);
    # "bfloat16" is the TPU analog of the torch lineage training the
    # generator under autocast(bf16).  Params, the VQ nearest-neighbor
    # search + EMA transition, the returned waveform, and every loss stay
    # fp32 (DistilCodecModule compute_dtype semantics).
    gen_dtype: str | None = None
    # add debug/* gradient- and update-health metrics (per-family absmax of
    # grads, y_hat absmax, post-update param absmax) to the step's metrics —
    # the tool that localized the r5 step-37 NaN (DESIGN.md "r5: training
    # that learns").  Costs a few reduces; off in production.
    debug_metrics: bool = False
    # measured-NEGATIVE option, default off: jax.checkpoint around the
    # discriminator forwards made peak memory WORSE (18.1 -> 42.2 GB at
    # batch 19x72000) — it defeats XLA's own auto-remat-with-compression of
    # the padded grouped-conv buffers and widens fwd+bwd co-residency.
    remat_discriminators: bool = False

    def __post_init__(self):
        if self.disc_dtype is None:
            self.disc_dtype = self.train_cfg.disc_dtype
        if self.gen_dtype is None:
            self.gen_dtype = self.train_cfg.gen_dtype
        self.gen_dtype = _check_dtype("gen_dtype", self.gen_dtype)
        self.disc_dtype = _check_dtype("disc_dtype", self.disc_dtype)
        gdt = (self.gen_dtype or "").replace("bf16", "bfloat16")
        self.module = DistilCodecModule(
            self.codec_cfg,
            compute_dtype=jnp.dtype(gdt) if gdt else None,
            gen_remat=self.train_cfg.gen_remat,
        )
        from ..dsp.mel import LogMelSpectrogram

        spec = self.codec_cfg.spec
        # plain functional transform (no params) — used by the G loss for the
        # mel-reconstruction L1 without round-tripping through module.apply
        self._mel = LogMelSpectrogram(
            sample_rate=spec.sampling_rate,
            n_fft=spec.n_fft,
            win_length=spec.win_size,
            hop_length=spec.hop_size,
            n_mels=spec.num_mels,
            f_min=spec.fmin,
            f_max=spec.fmax,
        )
        ddt = (self.disc_dtype or "").replace("bf16", "bfloat16")
        # disc_batch_pack: False | True/"both" | "d" (D phase only — see
        # TrainConfig docstring for why the G phase may prefer unpacked)
        bp = self.train_cfg.disc_batch_pack
        if bp not in (False, True, "both", "d", "", None):
            raise ValueError(
                f"disc_batch_pack={bp!r}: expected False/True/'both'/'d'"
            )
        pack_d = bool(bp)
        pack_g = bp in (True, "both")
        # the exact-lowering recipe switches ride as module attributes (not
        # process env), so the production recipe is one config object and two
        # Trainers with different recipes coexist in one process
        disc_kw = dict(
            dtype=jnp.dtype(ddt) if ddt else None,
            grouped_conv=self.train_cfg.grouped_conv or None,
            msstft_freq_pack=self.train_cfg.msstft_freq_pack or None,
        )
        self.disc = Discriminators(
            self.codec_cfg, batch_pack=pack_d, **disc_kw
        )
        # same param tree (packing is a pure execution-shape change), used
        # for the G-phase adversarial/FM forward
        self.disc_g = (
            self.disc
            if pack_g == pack_d
            else Discriminators(self.codec_cfg, batch_pack=pack_g, **disc_kw)
        )
        adam = self.train_cfg.adam
        schedule = lambda step: adam.learning_rate * (
            adam.lr_decay ** (step // self.steps_per_epoch)
        )

        def make_tx():
            tx = optax.adamw(
                schedule,
                b1=adam.adam_b1,
                b2=adam.adam_b2,
                weight_decay=adam.weight_decay,
            )
            # gradient accumulation (train_config.json:55 accumulation_steps)
            if self.train_cfg.accumulation_steps > 1:
                tx = optax.MultiSteps(
                    tx, every_k_schedule=self.train_cfg.accumulation_steps
                )
            return tx

        self.gen_tx = make_tx()
        self.disc_tx = make_tx()

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, segment_len: int | None = None) -> CodecTrainState:
        segment_len = segment_len or self.codec_cfg.spec.segment_size
        audio = jnp.zeros((1, segment_len))
        rng_g, rng_d = jax.random.split(rng)
        gen_vars = jax.jit(self.module.init)(rng_g, audio)
        wave_len = self._gen_len(segment_len)
        dvars = jax.jit(self.disc.init)(
            rng_d, audio[:, :wave_len], audio[:, :wave_len]
        )
        return CodecTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            codebook=gen_vars["codebook"],
            gen_opt_state=self.gen_tx.init(gen_vars["params"]),
            disc_params=dvars["params"],
            spectral=dvars.get("spectral", {}),
            disc_opt_state=self.disc_tx.init(dvars["params"]),
        )

    def init_state_from_codec_variables(
        self, rng: jax.Array, variables: dict, segment_len: int | None = None
    ) -> CodecTrainState:
        """Distillation / resume init: inherit encoder/decoder/quantizer
        weights (train_config.json:46-51 ``is_distill`` semantics)."""
        state = self.init_state(rng, segment_len)
        return state.replace(
            gen_params=variables["params"],
            codebook=variables["codebook"],
            gen_opt_state=self.gen_tx.init(variables["params"]),
        )

    def _gen_len(self, segment_len: int) -> int:
        spec = self.codec_cfg.spec
        frames = 1 + (segment_len + spec.win_size - spec.hop_size - spec.win_size) // spec.hop_size
        return frames * spec.hop_size

    # ------------------------------------------------------------ train step

    def _gen_forward(self, params, codebook, audio, rngs, update_ema: bool):
        variables = {"params": params, "codebook": codebook}
        out, mutated = self.module.apply(
            variables,
            audio,
            training=True,
            update_ema=update_ema,
            rngs=rngs,
            mutable=["codebook"],
        )
        y_hat, result = out
        return y_hat, result, mutated["codebook"]

    def train_step(self, state: CodecTrainState, audio: jnp.ndarray, rng: jax.Array):
        """One GAN step on a (B, segment) audio batch.  Returns (state, metrics).

        Torch-lineage single-forward structure (SURVEY §3.4; the reference's
        HiFiGAN ancestry computes one ``y_g_hat`` and reuses it for both the
        D and G losses): the generator forward runs ONCE under ``jax.vjp``;
        its ``stop_gradient``'d output feeds the D update, then the G loss is
        differentiated w.r.t. the forward's *outputs* and those cotangents are
        pulled back through the saved residuals — no second encoder+VQ+decoder
        forward, and one shared droppath draw so D trains against exactly the
        sample G is optimized on.
        """
        tcfg = self.train_cfg
        rng_fwd, rng_expiry = jax.random.split(rng)
        wave_len = self._gen_len(audio.shape[-1])
        y = audio[:, :wave_len]
        # codebook_expiry: consumed only when quantizer.threshold_ema_dead_code
        # > 0 (dead-code resampling from the batch — the standard EMA-VQ
        # anti-collapse tool, vector_quantize_pytorch.py:441-460; unused rngs
        # are free in flax).  From-scratch training NEEDS it: the r5 flagship
        # overfit run collapsed to 1/32768 codes by step ~100 without it
        # (DESIGN.md "r5: training that learns").
        fwd_rngs = {"droppath": rng_fwd, "codebook_expiry": rng_expiry}

        # -------------- ONE generator forward (EMA codebook transition here)
        def gen_fwd(gen_params):
            y_hat, result, new_codebook = self._gen_forward(
                gen_params,
                state.codebook,
                audio,
                fwd_rngs,
                update_ema=True,
            )
            diff = (
                y_hat,
                result.commitment_loss,
                result.codebook_diversity_loss,
            )
            return diff, (result.codes, new_codebook)

        (y_hat, commit, div), gen_vjp, (codes, new_codebook) = jax.vjp(
            gen_fwd, state.gen_params, has_aux=True
        )
        y_hat_ng = jax.lax.stop_gradient(y_hat)

        # ---------------- D step (generator output detached)
        def _disc_train_apply(disc_params, a, b):
            return self.disc.apply(
                {"params": disc_params, "spectral": state.spectral},
                a,
                b,
                update_stats=True,
                mutable=["spectral"],
            )

        if self.remat_discriminators:
            _disc_train_apply = jax.checkpoint(_disc_train_apply)

        def d_loss_fn(disc_params):
            outs, mutated = _disc_train_apply(disc_params, y, y_hat_ng)
            loss = 0.0
            parts = {}
            for name, pack in outs.items():
                rs, gs = pack[0], pack[1]
                l, _, _ = discriminator_loss(rs, gs)
                parts[f"d_loss/{name}"] = l
                loss += l
            return loss, (parts, mutated["spectral"])

        (d_loss, (d_parts, new_spectral)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        d_updates, new_d_opt = self.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ------- G step: loss on the shared forward's outputs, grads pulled
        # back through gen_vjp (one generator backward, zero extra forwards)
        mel_real = self._mel(y)

        def g_loss_fn(y_hat_in, commit_in, div_in):
            _disc_eval_apply = lambda a, b: self.disc_g.apply(
                {"params": new_disc_params, "spectral": new_spectral},
                a,
                b,
                update_stats=False,
            )
            if self.remat_discriminators:
                _disc_eval_apply = jax.checkpoint(_disc_eval_apply)
            outs = _disc_eval_apply(y, y_hat_in)
            adv = 0.0
            fm = 0.0
            for name, pack in outs.items():
                gs = pack[1]
                fr, fg = pack[2], pack[3]
                l_adv, _ = generator_loss(gs)
                adv += l_adv
                fm += feature_loss(fr, fg)

            mel_loss = mel_l1_loss(mel_real, self._mel(y_hat_in))

            vq_loss = (
                tcfg.codebook_loss_lambda * div_in
                + tcfg.commitment_loss_lambda * commit_in
            )
            total = adv + fm + self.mel_loss_weight * mel_loss + vq_loss
            aux = {
                "g_loss/adv": adv,
                "g_loss/feature_matching": fm,
                "g_loss/mel_l1": mel_loss,
                "g_loss/vq_commitment": commit_in,
                "g_loss/vq_diversity": div_in,
                "g_loss/total": total,
            }
            return total, aux

        (g_loss, g_parts), out_cotangents = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1, 2), has_aux=True
        )(y_hat, commit, div)
        (g_grads,) = gen_vjp(out_cotangents)
        g_updates, new_g_opt = self.gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {"d_loss/total": d_loss, **d_parts, **g_parts}
        metrics.update(
            codebook_metrics(codes, self.codec_cfg.quantizer.codebook_size)
        )
        if self.debug_metrics:

            def _absmax(tree):
                return jnp.max(
                    jnp.stack(
                        [
                            jnp.max(jnp.abs(l.astype(jnp.float32)))
                            for l in jax.tree_util.tree_leaves(tree)
                        ]
                    )
                )

            for k, sub in g_grads.items():
                metrics[f"debug/ggrad/{k}"] = _absmax(sub)
            for k, sub in d_grads.items():
                metrics[f"debug/dgrad/{k}"] = _absmax(sub)
            metrics["debug/y_hat"] = jnp.max(jnp.abs(y_hat))
            metrics["debug/gen_params"] = _absmax(new_gen_params)
            metrics["debug/disc_params"] = _absmax(new_disc_params)
            metrics["debug/spectral"] = _absmax(new_spectral)
            metrics["debug/codebook_embed"] = _absmax(new_codebook)

        new_state = CodecTrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            codebook=new_codebook,
            gen_opt_state=new_g_opt,
            disc_params=new_disc_params,
            spectral=new_spectral,
            disc_opt_state=new_d_opt,
        )
        return new_state, metrics

    # ------------------------------------------------------------- eval step

    def eval_step(self, state: CodecTrainState, audio: jnp.ndarray):
        """Validation: multi-resolution mel L1 (the reference's
        init_multi_mel_transforms x{1,2,1/2,1/4} validation losses,
        meldataset.py:304-323) + codebook metrics."""
        from ..dsp.mel import LogMelSpectrogram

        wave_len = self._gen_len(audio.shape[-1])
        y = audio[:, :wave_len]
        variables = {"params": state.gen_params, "codebook": state.codebook}
        y_hat, result = self.module.apply(variables, audio)
        y_hat = y_hat[:, : y.shape[-1]]
        spec = self.codec_cfg.spec
        metrics = {}
        total = 0.0
        for tag, mult in (("x1", 1), ("x2", 2), ("x0.5", 0.5), ("x0.25", 0.25)):
            mel = LogMelSpectrogram(
                sample_rate=spec.sampling_rate,
                n_fft=int(spec.n_fft * mult),
                win_length=int(spec.win_size * mult),
                hop_length=int(spec.hop_size * mult),
                n_mels=spec.num_mels,
                f_min=spec.fmin,
                f_max=spec.fmax,
            )
            l = mel_l1_loss(mel(y), mel(y_hat))
            metrics[f"val/mel_l1_{tag}"] = l
            total += l
        metrics["val/mel_l1_total"] = total
        metrics.update(
            {
                f"val/{k}": v
                for k, v in codebook_metrics(
                    result.codes, self.codec_cfg.quantizer.codebook_size
                ).items()
            }
        )
        return metrics

    # ------------------------------------------------------- jit + sharding

    def jit_train_step(self, mesh=None, donate: bool = False) -> Callable:
        """jit the train step; with a mesh, shard the batch along 'data' and
        replicate the state (GSPMD inserts all collectives).

        ``donate=True`` donates the train state so XLA updates params /
        optimizer moments / EMA codebook in place (halves peak state HBM).
        Only for steady-state loops: the caller must not reuse the old state
        object after the call (the buffers are invalidated).
        """
        donate_kw = {"donate_argnums": (0,)} if donate else {}
        if mesh is None:
            return jax.jit(self.train_step, **donate_kw)
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        batch_sharded = NamedSharding(mesh, P("data"))
        return jax.jit(
            self.train_step,
            in_shardings=(replicated, batch_sharded, replicated),
            out_shardings=(replicated, replicated),
            **donate_kw,
        )
