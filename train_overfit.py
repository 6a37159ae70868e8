"""Sustained overfit run: prove the trainer LEARNS (r4 VERDICT item 1).

Trains the FLAGSHIP codec (reference configs/model_config.json — 77.2M
encoder + 67.8M decoder + 32768x3584 EMA codebook) with the production
recipe (bf16 gen+disc, dense128 tile-grouped MSD lowering, chain-packed
MS-STFT, remat off) on the reference's own 98 org wavs
(/root/reference/data/org_audios — the audio the published checkpoint's
demo reconstructions were made from), batch 16 x 3 s crops @ 24 kHz —
the training the reference implies but never shipped (SURVEY §3.4;
/root/reference/configs/train_config.json:2-8, README.md:42-59).

Artifacts (under --out, default generated/overfit):
  metrics.jsonl    — per-step training metrics (every step; host-fetched in
                     windows so dispatch stays async)
  snapshots.jsonl  — held-in clip reconstruction quality (SI-SNR, STOI,
                     multi-res mel-L1, pesq_like) + EMA codebook activity
                     at --snapshot-every intervals
  step0_recon.wav / final_recon.wav / reference.wav
  summary.json     — first-vs-last aggregates for BASELINE.md/DESIGN.md

Usage: python train_overfit.py [--steps 2000] [--batch 16] [--snapshot-every 250]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import time

import numpy as np

SR = 24000
SEGMENT = 72000


def _tree_find(tree, name: str):
    """All leaves whose key path contains ``name`` (e.g. 'cluster_size')."""
    import jax

    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if any(name in str(getattr(k, "key", k)) for k in path):
            out.append(leaf)
    return out


def _tiny_config() -> dict:
    """Dryrun-sized config for a CPU smoke test of the script mechanics."""
    return {
        "spec_transform": {
            "sampling_rate": SR, "segment_size": 8192, "num_mels": 32,
            "n_fft": 256, "hop_size": 64, "win_size": 256,
            "fmin": 0, "fmax": 12000,
        },
        "encoder": {
            "input_channels": 32, "depths": [1, 1], "dims": [32, 48],
            "drop_path_rate": 0.1, "kernel_size": 7,
        },
        "decoder": {
            "hop_length": 64, "upsample_rates": [4, 4, 2, 2],
            "upsample_kernel_sizes": [8, 8, 4, 4],
            "resblock_kernel_sizes": [3, 7],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
            "num_mels": 48, "upsample_initial_channel": 48,
            "use_template": False, "pre_conv_kernel_size": 7,
            "post_conv_kernel_size": 7,
        },
        "quantizer": {
            "quantizer_type": "grvq", "input_dim": 48, "n_groups": 1,
            "n_codebooks": 1, "codebook_size": 64, "codebook_dim": 56,
            "downsample_factor": [1], "ema_decay": 0.8,
            "codebook_diversity_loss_weight": 1.0,
            "codebook_diversity_temperature": 100.0,
        },
        "descriminators": {
            "MultiPeriodDiscriminator": {
                "periods": [2, 3], "kernal_size": 5, "stride": 3,
            },
            "MultiScaleDiscriminator": {
                "override_layers": [
                    [16, 15, 1, 1, 7],
                    [64, 41, 4, 4, 20],
                    [256, 41, 4, 16, 20],
                    [256, 41, 1, 16, 20],
                    [32, 5, 1, 1, 2],
                ],
            },
            "MultiScaleSTFTDiscriminator": {
                "filters": 8, "n_ffts": [256, 128],
                "hop_lengths": [64, 32], "win_lengths": [256, 128],
            },
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--steps",
        type=int,
        default=2000,
        help="GLOBAL step target (with --resume-from, training continues "
        "from the checkpoint's step up to this)",
    )
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--snapshot-every", type=int, default=250)
    ap.add_argument("--log-window", type=int, default=50)
    ap.add_argument("--out", default="generated/overfit")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument(
        "--dead-code-threshold",
        type=float,
        default=2.0,
        help="quantizer threshold_ema_dead_code: EMA clusters below this mass "
        "are resampled from the batch each step (the standard EMA-VQ "
        "anti-collapse tool, vector_quantize_pytorch.py:441-460).  The first "
        "r5 run WITHOUT it collapsed to 1/32768 codes by step ~100 and went "
        "NaN by step ~230; from-scratch training needs it.  0 disables.",
    )
    ap.add_argument(
        "--diversity-weight",
        type=float,
        default=0.0,
        help="quantizer codebook_diversity_loss_weight override.  The "
        "reference formula (replicated for parity) is softmax(+distance * "
        "temperature) — mass on FAR codes — whose entropy is then "
        "maximized; from scratch at flagship scale it drives encoder/"
        "codebook norms into runaway (measured absmax 2.2e3 -> 5.1e3 over "
        "7 steps, NaN soon after; generated/overfit_debug).  The reference "
        "always trained from a distill teacher (train_config.json:46-51) "
        "and never from scratch.  Default 0 = disabled for the learning "
        "demonstration.",
    )
    ap.add_argument(
        "--resume-from",
        default=None,
        help="checkpoint dir of a previous run (its final orbax state) to "
        "continue training from; step counter and lr schedule resume",
    )
    ap.add_argument(
        "--teacher-ckpt",
        default=None,
        help="directory holding a reference-format g_* checkpoint to DMS "
        "distill-init from (README.md:44-53): the student inherits the "
        "teacher's encoder/decoder, the quantizer/codebook start fresh "
        "(train_config.json:46-51 quantizer_transfer: false)",
    )
    ap.add_argument(
        "--debug-grads",
        action="store_true",
        help="add per-family grad/param absmax debug metrics to every step",
    )
    ap.add_argument(
        "--tiny",
        action="store_true",
        help="small config + short segment: CPU smoke test of the script "
        "mechanics only (set DISTILCODEC_PLATFORM=cpu)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if not args.resume_from:
        # fresh run, fresh ledgers (files are append-mode); a resumed run
        # APPENDS so the curve stays in one place
        for stale in ("metrics.jsonl", "snapshots.jsonl"):
            p = os.path.join(args.out, stale)
            if os.path.exists(p):
                os.remove(p)

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu import evaluation
    from distilcodec_nabeel_tpu.config import CodecConfig, TrainConfig
    from distilcodec_nabeel_tpu.pesq_like import pesq_like
    from distilcodec_nabeel_tpu.training.dataset import make_loader
    from distilcodec_nabeel_tpu.training.train import Trainer
    from distilcodec_nabeel_tpu.utils.audio_io import load_wav, save_wav
    from distilcodec_nabeel_tpu.utils.common import (
        enable_compilation_cache,
        load_json,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    t_start = time.perf_counter()

    if args.tiny:
        raw_cfg = _tiny_config()
        segment = 8192
    else:
        raw_cfg = load_json("/root/reference/configs/model_config.json")
        segment = SEGMENT
    if args.dead_code_threshold > 0:
        raw_cfg["quantizer"]["threshold_ema_dead_code"] = args.dead_code_threshold
    raw_cfg["quantizer"]["codebook_diversity_loss_weight"] = args.diversity_weight
    codec_cfg = CodecConfig.from_dict(raw_cfg)
    train_cfg = TrainConfig.from_dict(
        load_json("/root/reference/configs/train_config.json")
    )
    # production recipe (DESIGN.md "Training"; lr schedule uses the
    # reference's nominal 1000 steps/epoch, NOT the tiny 98-file epoch —
    # 0.98^(step/6) would collapse the lr before anything could learn)
    train_cfg = dataclasses.replace(
        train_cfg,
        batch_size=args.batch,
        gen_dtype="bfloat16",
        disc_dtype="bfloat16",
        grouped_conv="dense128",
        msstft_freq_pack="chain",
        gen_remat=False,
    )
    trainer = Trainer(
        codec_cfg,
        train_cfg,
        steps_per_epoch=1000,
        debug_metrics=args.debug_grads,
    )

    files = sorted(glob.glob("/root/reference/data/org_audios/*.wav"))
    assert len(files) >= 16, files
    loader = make_loader(
        files,
        batch_size=args.batch,
        segment_size=segment,
        sampling_rate=SR,
        num_workers=4,
        seed=args.seed,
    )

    # held-in snapshot clip: a fixed 3 s crop of the first org wav
    held, _ = load_wav(files[0], sr=SR)
    held = np.asarray(held, np.float32)[:segment]
    held = held / max(1e-8, np.abs(held).max()) * 0.95
    save_wav(os.path.join(args.out, "reference.wav"), held, SR)
    held_j = jnp.asarray(held)[None, :]

    state = trainer.init_state(jax.random.PRNGKey(args.seed), segment_len=segment)
    step_offset = 0
    if args.teacher_ckpt:
        from distilcodec_nabeel_tpu.training.loop import distill_init

        state = distill_init(
            state,
            trainer,
            codec_cfg,
            {
                "is_distill": True,
                "quantizer_transfer": False,
                "teacher_ckpt_path": args.teacher_ckpt,
            },
        )
    if args.resume_from:
        from distilcodec_nabeel_tpu.utils import checkpoint as ckpt_utils

        restored = ckpt_utils.restore_train_state(args.resume_from, state)
        if restored is None:
            raise SystemExit(f"--resume-from {args.resume_from}: no state found")
        state = restored
        step_offset = int(state.step)
        print(f"resumed from step {step_offset}", flush=True)
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.gen_params)
    )
    print(f"generator params: {n_params/1e6:.1f}M", flush=True)

    # one jitted step returning (state, packed-metrics-vector): a single tiny
    # fetch per log window instead of ~20 scalar RPCs per step
    metric_keys: list[str] = []

    def packed_step(state, audio, rng):
        new_state, metrics = trainer.train_step(state, audio, rng)
        keys = sorted(metrics)
        if not metric_keys:
            metric_keys.extend(keys)
        return new_state, jnp.stack([metrics[k].astype(jnp.float32) for k in keys])

    step_fn = jax.jit(packed_step, donate_argnums=(0,))

    # reconstruction program for snapshots (fixed (1, SEGMENT) shape: one
    # compile).  Weights ride as ARGUMENTS (never close jitted fns over
    # weight trees — the tunnel relay 413s on giant bodies, TODO.md hazards).
    def recon(params, codebook, audio):
        wave, result = trainer.module.apply(
            {"params": params, "codebook": codebook}, audio
        )
        return wave, result.codes

    recon_fn = jax.jit(recon)

    cb_size = codec_cfg.quantizer.codebook_size

    def snapshot(step, state):
        t0 = time.perf_counter()
        wave, codes = recon_fn(state.gen_params, state.codebook, held_j)
        wave = np.asarray(wave, np.float32)[0]
        n = min(len(wave), len(held))
        r, e = held[:n], wave[:n]
        cs = _tree_find(state.codebook, "cluster_size")
        cs = np.asarray(cs[0], np.float32).reshape(-1) if cs else np.zeros(1)
        # EMA cluster mass decays by 0.8/step: "active" = touched recently
        rec = {
            "step": step,
            "si_snr_db": evaluation.si_snr(r, e),
            "stoi": evaluation.stoi(r, e, SR),
            "mel_l1_total": evaluation.mel_l1_multi_res(r, e, codec_cfg.spec)[
                "mel_l1_total"
            ],
            "pesq_like": float(pesq_like(r, e, SR)),
            "held_codes_unique": int(len(np.unique(np.asarray(codes)))),
            "ema_active_codes": int((cs > 0.05).sum()),
            "ema_cluster_mass": float(cs.sum()),
            "codebook_size": cb_size,
            "eval_s": round(time.perf_counter() - t0, 2),
        }
        with open(os.path.join(args.out, "snapshots.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("snapshot:", json.dumps(rec), flush=True)
        return wave

    wave0 = snapshot(step_offset, state)
    save_wav(
        os.path.join(args.out, f"step{step_offset}_recon.wav"), wave0, SR
    )

    metrics_path = os.path.join(args.out, "metrics.jsonl")
    rng_step = jax.random.fold_in(jax.random.PRNGKey(args.seed), 7)
    step = step_offset  # --steps is the GLOBAL step target (resume-aware)
    window: list = []  # [(step, device metric vec)]
    t_win = time.perf_counter()

    def flush_window():
        nonlocal window, t_win
        if not window:
            return
        stacked = np.asarray(jnp.stack([m for _, m in window]))
        dt = (time.perf_counter() - t_win) / len(window)
        with open(metrics_path, "a") as f:
            for (s, _), row in zip(window, stacked):
                rec = {"step": s, **{k: float(v) for k, v in zip(metric_keys, row)}}
                rec["perf/step_time_s"] = round(dt, 4)
                f.write(json.dumps(rec) + "\n")
        last = {k: float(v) for k, v in zip(metric_keys, stacked[-1])}
        print(
            f"step {window[-1][0]:5d}  {dt*1000:6.1f} ms/step  "
            f"mel_l1={last.get('g_loss/mel_l1', float('nan')):.4f}  "
            f"g={last.get('g_loss/total', float('nan')):.3f}  "
            f"d={last.get('d_loss/total', float('nan')):.3f}  "
            f"ppl={last.get('codebook_perplexity', float('nan')):.1f}",
            flush=True,
        )
        window = []
        t_win = time.perf_counter()

    done = False
    while not done:
        for batch in loader:
            step += 1
            rng_step = jax.random.fold_in(rng_step, step)
            state, mvec = step_fn(state, jnp.asarray(batch), rng_step)
            window.append((step, mvec))
            if len(window) >= args.log_window or step == 1:
                flush_window()
            if step % args.snapshot_every == 0:
                flush_window()
                snapshot(step, state)
            if step % 2000 == 0:
                from distilcodec_nabeel_tpu.utils import checkpoint as _ck

                _ck.save_train_state(
                    os.path.join(args.out, "ckpt"), step, state, num_ckpt_keep=1
                )
            if step >= args.steps:
                done = True
                break
    flush_window()

    if step % args.snapshot_every == 0:
        # already snapshotted in-loop; just decode once more for the wav
        wave_f, _ = recon_fn(state.gen_params, state.codebook, held_j)
        wave_f = np.asarray(wave_f, np.float32)[0]
    else:
        wave_f = snapshot(step, state)

    save_wav(os.path.join(args.out, "final_recon.wav"), wave_f, SR)

    from distilcodec_nabeel_tpu.utils import checkpoint as ckpt_utils

    if step % 2000 != 0:  # else the in-loop periodic save already wrote it
        ckpt_utils.save_train_state(
            os.path.join(args.out, "ckpt"), step, state, num_ckpt_keep=1
        )

    # first-vs-last training-metric aggregates
    rows = [json.loads(l) for l in open(metrics_path)]
    first = rows[: min(20, len(rows))]
    lastr = rows[-min(100, len(rows)) :]
    snaps = [json.loads(l) for l in open(os.path.join(args.out, "snapshots.jsonl"))]
    mean = lambda rs, k: float(np.mean([r[k] for r in rs if k in r]))
    summary = {
        "steps": step,
        "batch": args.batch,
        "segment": segment,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "train_mel_l1_first20": mean(first, "g_loss/mel_l1"),
        "train_mel_l1_last100": mean(lastr, "g_loss/mel_l1"),
        "d_loss_last100": mean(lastr, "d_loss/total"),
        "g_loss_last100": mean(lastr, "g_loss/total"),
        "perplexity_first20": mean(first, "codebook_perplexity"),
        "perplexity_last100": mean(lastr, "codebook_perplexity"),
        "snapshot_first": snaps[0],
        "snapshot_last": snaps[-1],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
