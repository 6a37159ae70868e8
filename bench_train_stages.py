"""Per-stage device-time profile of the GAN train step at full size.

Times the step's constituent programs separately with the two-K fused-scan
methodology (DESIGN.md "timing"): generator forward, discriminator forward
(each family separately), D-step fwd+bwd+adam, G-step fwd+bwd+adam, and the
full train step — so the optimization target is visible (the full step is
NOT the sum of parts: XLA fuses/overlaps across them, but the ordering of
costs is what matters).

Backward attribution (VERDICT r1 item 8): the ``*_dgrad`` stages time each
discriminator family's fwd+bwd w.r.t. its params (the D phase), ``*_ggrad``
the fwd+bwd w.r.t. y_hat through adv+FM losses (the G phase), ``gen_vjp`` the
generator forward+backward pullback, ``mel_grad`` the mel-L1 bwd, ``ema`` the
EMA codebook transition alone — so the train step's cost ordering is visible
end to end.

Usage: python bench_train_stages.py [--batch 8] [--segment 72000]
                                    [--iters 2 6] [--stages a,b,...]
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

SR = 24000


def timed_ms(fn, args, k1: int, k2: int) -> float:
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1,))
    def run(args, n):
        def body(acc, i):
            s = fn(i, *args)
            leaves = jax.tree_util.tree_leaves(s)
            tot = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return acc + tot, ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(n))
        return acc

    ts = []
    for n in (k1, k2):
        float(run(args, n))  # compile + warm
        t0 = time.perf_counter()
        float(run(args, n))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment", type=int, default=72000)
    ap.add_argument("--iters", nargs=2, type=int, default=[2, 6])
    ap.add_argument(
        "--stages",
        default=(
            "gen_fwd,mpd,msd,msstft,mpd_dgrad,msd_dgrad,msstft_dgrad,"
            "mpd_ggrad,msd_ggrad,msstft_ggrad,gen_vjp,mel_grad,ema,full_step"
        ),
        help=(
            "comma list from: gen_fwd,mpd,msd,msstft,{mpd,msd,msstft}_dgrad,"
            "{mpd,msd,msstft}_ggrad,gen_vjp,mel_grad,ema,full_step"
        ),
    )
    ap.add_argument(
        "--disc-dtype",
        default=None,
        help="time the discriminator stages in this dtype (e.g. bfloat16)",
    )
    ap.add_argument(
        "--gen-dtype",
        default=None,
        help="time the generator stages (gen_fwd/gen_vjp/full_step) in this "
        "compute dtype (production recipe: bfloat16 — the r4 attribution "
        "probed fp32 'for r1-r3 comparability' and mis-ranked the levers, "
        "r4 VERDICT weak 1)",
    )
    ap.add_argument(
        "--no-gen-remat",
        action="store_true",
        help="decoder resblock remat off (production recipe)",
    )
    ap.add_argument(
        "--batch-pack",
        action="store_true",
        help="real+fake as one concatenated batch per family "
        "(TrainConfig.disc_batch_pack; exact up to reduction round-off)",
    )
    ap.add_argument(
        "--freq-pack",
        type=lambda s: s if s == "chain" else int(s),
        default=0,
        help="MS-STFT freq->lane packing factor (int) or 'chain' "
        "(production recipe since r4: chain)",
    )
    ap.add_argument(
        "--grouped-conv",
        default=None,
        help="MSD grouped-conv lowering for the standalone family stages "
        "(production recipe: dense128)",
    )
    args = ap.parse_args()
    k1, k2 = args.iters
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.config import CodecConfig, TrainConfig
    from distilcodec_nabeel_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from distilcodec_nabeel_tpu.models.msstftd import MultiScaleSTFTDiscriminator
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
    if args.grouped_conv:
        train_cfg = dataclasses.replace(train_cfg, grouped_conv=args.grouped_conv)
    if args.freq_pack:
        train_cfg = dataclasses.replace(train_cfg, msstft_freq_pack=args.freq_pack)
    if args.batch_pack:
        train_cfg = dataclasses.replace(train_cfg, disc_batch_pack=True)
    trainer = Trainer(
        codec_cfg,
        train_cfg,
        steps_per_epoch=1000,
        disc_dtype=args.disc_dtype,
        gen_dtype=args.gen_dtype,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), segment_len=args.segment)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, args.segment)).astype(np.float32) * 0.1
    )
    wave_len = trainer._gen_len(args.segment)
    y = audio[:, :wave_len]
    ddt = jnp.dtype(args.disc_dtype) if args.disc_dtype else jnp.float32
    y = y.astype(ddt)

    def pert(x, i):
        return x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

    def rec(stage, ms):
        print(json.dumps({"stage": stage, "ms": round(ms, 2)}), flush=True)

    # ---------------- generator (codec) forward, training mode, no EMA
    # NOTE: state params ride through timed_ms args, never closures — closed-
    # over weights become program constants and the ~GB serialized body blows
    # the axon relay's remote-compile limit (HTTP 413 / broken pipe, r3)
    def gen_fwd(i, gp, cb, a):
        out, _ = trainer.module.apply(
            {"params": gp, "codebook": cb},
            pert(a, i),
            training=True,
            update_ema=False,
            rngs={"droppath": jax.random.PRNGKey(0)},
            mutable=["codebook"],
        )
        y_hat, result = out
        return y_hat, result.commitment_loss

    if "gen_fwd" in stages:
        rec(
            "gen_fwd(train mode)",
            timed_ms(
                gen_fwd, (state.gen_params, state.codebook, audio), k1, k2
            ),
        )

    # materialize a fake y_hat for discriminator timing (right shape/dtype)
    y_hat = jnp.asarray(
        rng.standard_normal((args.batch, wave_len)).astype(np.float32) * 0.1
    ).astype(ddt)

    d = codec_cfg.descriminators or {}
    mpd_cfg = d.get("MultiPeriodDiscriminator", {})
    msstft_cfg = d.get("MultiScaleSTFTDiscriminator", {})

    from distilcodec_nabeel_tpu.training.losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
        mel_l1_loss,
    )

    # uniform per-family interface: fn(params, a, b) -> (rs, gs, fr, fg)
    families = {}
    if stages & {"mpd", "mpd_dgrad", "mpd_ggrad"}:
        mpd = MultiPeriodDiscriminator(
            periods=tuple(mpd_cfg.get("periods", (2, 3, 5, 7, 11))),
            kernel_size=mpd_cfg.get("kernal_size", 5),
            stride=mpd_cfg.get("stride", 3),
            batch_pack=args.batch_pack,
        )
        vmpd = mpd.init(jax.random.PRNGKey(1), y, y_hat)
        families["mpd"] = (lambda p, a, b: mpd.apply(p, a, b), vmpd)
    if stages & {"msd", "msd_dgrad", "msd_ggrad"}:
        msd = MultiScaleDiscriminator(
            grouped_conv_lowering=args.grouped_conv,
            batch_pack=args.batch_pack,
        )
        vmsd = msd.init(jax.random.PRNGKey(2), y, y_hat)
        families["msd"] = (lambda p, a, b: msd.apply(p, a, b), vmsd)
    if stages & {"msstft", "msstft_dgrad", "msstft_ggrad"}:
        msstft = MultiScaleSTFTDiscriminator(
            filters=msstft_cfg.get("filters", 32),
            n_ffts=tuple(msstft_cfg.get("n_ffts", (1024, 2048, 512, 256, 128))),
            hop_lengths=tuple(
                msstft_cfg.get("hop_lengths", (256, 512, 128, 64, 32))
            ),
            win_lengths=tuple(
                msstft_cfg.get("win_lengths", (1024, 2048, 512, 256, 128))
            ),
            freq_pack=args.freq_pack or None,
        )
        vst = msstft.init(jax.random.PRNGKey(3), y)

        if args.batch_pack:

            def _fm_slice(f, sl):
                # chain-packed fmaps are (array, scale) pairs
                return (f[0][sl], f[1]) if isinstance(f, tuple) else f[sl]

            def _msstft_both(p, a, b):
                B = a.shape[0]
                lg, fm = msstft.apply(p, jnp.concatenate([a, b], axis=0))
                return (
                    [l[:B] for l in lg],
                    [l[B:] for l in lg],
                    [[_fm_slice(f, slice(None, B)) for f in m] for m in fm],
                    [[_fm_slice(f, slice(B, None)) for f in m] for m in fm],
                )

        else:

            def _msstft_both(p, a, b):
                r_log, r_fm = msstft.apply(p, a)
                g_log, g_fm = msstft.apply(p, b)
                return r_log, g_log, r_fm, g_fm

        families["msstft"] = (_msstft_both, vst)

    for name, (fn, params) in families.items():
        if name in stages:
            rec(
                f"{name}_fwd",
                timed_ms(
                    lambda i, params, a, b, fn=fn: fn(
                        params, pert(a, i), pert(b, i)
                    )[:2],
                    (params, y, y_hat),
                    k1,
                    k2,
                ),
            )
        if f"{name}_dgrad" in stages:
            # D phase: fwd + bwd w.r.t. the discriminator's params
            def d_loss(p, a, b, fn=fn):
                rs, gs, _, _ = fn(p, a, b)
                l, _, _ = discriminator_loss(rs, gs)
                return l

            rec(
                f"{name}_dgrad",
                timed_ms(
                    lambda i, params, a, b, d_loss=d_loss: jax.value_and_grad(
                        d_loss
                    )(params, pert(a, i), pert(b, i)),
                    (params, y, y_hat),
                    k1,
                    k2,
                ),
            )
        if f"{name}_ggrad" in stages:
            # G phase: fwd + bwd w.r.t. y_hat through adv + FM losses
            def g_loss(b, params, a, fn=fn):
                rs, gs, fr, fg = fn(params, a, b)
                adv, _ = generator_loss(gs)
                return adv + feature_loss(fr, fg)

            rec(
                f"{name}_ggrad",
                timed_ms(
                    lambda i, params, a, b, g_loss=g_loss: jax.grad(g_loss)(
                        pert(b, i), params, pert(a, i)
                    ),
                    (params, y, y_hat),
                    k1,
                    k2,
                ),
            )

    # ---------------- generator fwd + backward pullback (fixed cotangent)
    if "gen_vjp" in stages:

        def gen_vjp(i, gp, cb, a, ct):
            def f(p):
                out, _ = trainer.module.apply(
                    {"params": p, "codebook": cb},
                    pert(a, i),
                    training=True,
                    update_ema=False,
                    rngs={"droppath": jax.random.PRNGKey(0)},
                    mutable=["codebook"],
                )
                return out[0]

            y_out, vjp = jax.vjp(f, gp)
            (g,) = vjp(ct + y_out * 1e-9)
            return jax.tree_util.tree_leaves(g)[0]

        ct = jnp.asarray(
            rng.standard_normal((args.batch, wave_len)).astype(np.float32)
        )
        rec(
            "gen_vjp(fwd+bwd)",
            timed_ms(
                gen_vjp,
                (state.gen_params, state.codebook, audio, ct),
                k1,
                k2,
            ),
        )

    if "mel_grad" in stages:
        rec(
            "mel_grad",
            timed_ms(
                lambda i, a, b: jax.grad(
                    lambda bb: mel_l1_loss(
                        trainer._mel(a.astype(jnp.float32)),
                        trainer._mel(bb.astype(jnp.float32)),
                    )
                )(pert(b, i)),
                (y, y_hat),
                k1,
                k2,
            ),
        )

    if "ema" in stages:
        # EMA codebook transition alone: quantizer on precomputed latents
        frames = wave_len // codec_cfg.spec.hop_size
        lat = jnp.asarray(
            rng.standard_normal(
                (args.batch, frames, codec_cfg.quantizer.input_dim)
            ).astype(np.float32)
        )

        def ema(i, gp, cb, z):
            _, mut = trainer.module.apply(
                {"params": gp, "codebook": cb},
                pert(z, i),
                training=True,
                update_ema=True,
                method=lambda m, zz, **kw: m.quantizer(zz, **kw),
                mutable=["codebook"],
            )
            return jax.tree_util.tree_leaves(mut)[0]

        rec(
            "ema_transition",
            timed_ms(
                ema, (state.gen_params, state.codebook, lat), k1, k2
            ),
        )

    # ---------------- full step (fwd+bwd+both adam updates, EMA transition)
    if "full_step" in stages:

        def full(i, st, a):
            st2, metrics = trainer.train_step(st, pert(a, i), jax.random.PRNGKey(0))
            # return the WHOLE new state: timed_ms's scan body sums every
            # leaf, so nothing is DCE'd.  Returning only g_loss/total (the
            # r1-r4 version) let XLA dead-code-eliminate the generator
            # backward and BOTH optimizer updates — full_step readings
            # before r5 under-measure the step (434 vs 659 ms at b16
            # production recipe); bench_train.py (chained donated steps)
            # was always the honest end-to-end number.
            return st2, metrics["g_loss/total"]

        rec("full_step", timed_ms(full, (state, audio), k1, k2))


if __name__ == "__main__":
    main()
