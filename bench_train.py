"""Training-step throughput on the flagship full-size codec.

Times the jitted GAN train step (D update + MPD/MSD/MS-STFT, G update with
EMA codebook transition) at a configurable per-chip batch of 3-second crops
(segment_size 72000, train_config.json:60-61 trains at 152/8 = 19 per GPU)
and reports audio-seconds of training data consumed per wall-clock second per
chip.

Timing follows DESIGN.md "timing methodology": K chained donated steps with
one final host fetch, per-step = (t(K2)-t(K1))/(K2-K1) to cancel the ~80 ms
tunnel dispatch latency.  State donation is ON (the production loop's mode).

Usage: python bench_train.py [--batch 19] [--segment 72000] [--iters 4 12]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

SR = 24000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=19)
    ap.add_argument("--segment", type=int, default=72000)
    ap.add_argument("--iters", nargs=2, type=int, default=[4, 12])
    ap.add_argument(
        "--disc-dtype",
        default=None,
        help="bfloat16: halve discriminator conv memory / double MXU rate",
    )
    ap.add_argument(
        "--gen-dtype",
        default=None,
        help="bfloat16: generator conv stacks in bf16 (autocast analog; "
        "params/VQ/losses stay fp32)",
    )
    ap.add_argument(
        "--no-gen-remat",
        action="store_true",
        help="disable decoder resblock remat (numerics-neutral; trades HBM "
        "for the recomputed resblock forwards in the backward)",
    )
    ap.add_argument(
        "--remat-stages",
        default=None,
        help="comma stage list to remat (e.g. '4' = final C=32 stage only; "
        "overrides --no-gen-remat; numerics-neutral memory squeeze)",
    )
    ap.add_argument(
        "--batch-pack",
        nargs="?",
        const="both",
        default=None,
        choices=["both", "d"],
        help="real+fake as one concatenated discriminator batch "
        "(TrainConfig.disc_batch_pack; exact up to reduction round-off). "
        "'d' packs only the D phase (the G phase DCEs the real-side "
        "backward when unpacked)",
    )
    ap.add_argument(
        "--grouped-conv",
        default=None,
        choices=[None, "grouped", "dense", "dense128", "dense_gw"],
        help="MSD grouped-conv lowering (production recipe: dense128)",
    )
    ap.add_argument(
        "--msstft-pack",
        default="0",
        help="MS-STFT freq->lane packing factor (int, production recipe: 4) "
        "or 'chain' for the chain-packed stack",
    )
    args = ap.parse_args()
    k1, k2 = args.iters

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.config import CodecConfig, TrainConfig
    from distilcodec_nabeel_tpu.training.train import Trainer
    from distilcodec_nabeel_tpu.utils.common import (
        enable_compilation_cache,
        load_json,
    )

    enable_compilation_cache()
    codec_cfg = CodecConfig.from_dict(
        load_json("/root/reference/configs/model_config.json")
    )
    train_cfg = TrainConfig.from_dict(
        load_json("/root/reference/configs/train_config.json")
    )
    import dataclasses

    if args.no_gen_remat:
        train_cfg = dataclasses.replace(train_cfg, gen_remat=False)
    if args.remat_stages is not None:
        train_cfg = dataclasses.replace(train_cfg, gen_remat=args.remat_stages)
    if args.batch_pack:
        train_cfg = dataclasses.replace(
            train_cfg,
            disc_batch_pack=True if args.batch_pack == "both" else args.batch_pack,
        )
    if args.grouped_conv:
        train_cfg = dataclasses.replace(train_cfg, grouped_conv=args.grouped_conv)
    if args.msstft_pack and args.msstft_pack != "0":
        train_cfg = dataclasses.replace(
            train_cfg,
            msstft_freq_pack=(
                args.msstft_pack
                if args.msstft_pack == "chain"
                else int(args.msstft_pack)
            ),
        )
    trainer = Trainer(
        codec_cfg,
        train_cfg,
        steps_per_epoch=1000,
        disc_dtype=args.disc_dtype,
        gen_dtype=args.gen_dtype,
    )

    state = trainer.init_state(jax.random.PRNGKey(0), segment_len=args.segment)
    step_fn = trainer.jit_train_step(mesh=None, donate=True)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, args.segment)).astype(np.float32) * 0.1
    )

    def run(state, n):
        for i in range(n):
            state, metrics = step_fn(
                state, audio + jnp.float32(i) * 1e-6, jax.random.PRNGKey(i)
            )
        # host fetch forces the whole chain (block_until_ready is a no-op
        # on the tunneled backend — DESIGN.md)
        float(metrics["g_loss/total"])
        return state

    state = run(state, 1)  # compile + warm
    ts = []
    for n in (k1, k2):
        t0 = time.perf_counter()
        state = run(state, n)
        ts.append(time.perf_counter() - t0)
    per_step = (ts[1] - ts[0]) / (k2 - k1)

    audio_seconds = args.batch * args.segment / SR
    print(
        json.dumps(
            {
                "metric": "GAN train-step throughput per chip",
                "value": round(audio_seconds / per_step, 2),
                "unit": "audio-seconds/s/chip",
                "step_time_s": round(per_step, 4),
                "batch": args.batch,
                "segment": args.segment,
                "disc_dtype": args.disc_dtype or "float32",
                "gen_dtype": args.gen_dtype or "float32",
                "gen_remat": args.remat_stages
                if args.remat_stages is not None
                else (not args.no_gen_remat),
                "disc_batch_pack": args.batch_pack,
                "grouped_conv": train_cfg.grouped_conv or "grouped",
                "msstft_freq_pack": train_cfg.msstft_freq_pack,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
