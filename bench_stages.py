"""Per-stage device-time profile of the flagship round trip.

Times each pipeline stage (mel, encoder, VQ search, codebook decode, each
generator upsample stage, conv_post) as its own fused-scan program on the
real chip, using the two-K methodology from DESIGN.md "timing": per-iter
time = (t(K2) - t(K1)) / (K2 - K1), which cancels the ~80 ms tunnel dispatch
cost and any fixed warm-up work.

Usage:  python bench_stages.py [--iters K1 K2] [--batch B] [--seconds S]
Prints one JSON line per stage: {"stage": ..., "ms": ..., "shape": ...}.

This is the tool behind the stage tables in TODO.md / DESIGN.md §5.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

SR = 24000


def timed_ms(fn, args, k1: int, k2: int) -> float:
    """Per-iteration ms of fn(i, *args) via two fused lax.scan runs.

    fn receives the step index i and must fold it into its inputs (so the
    compiler cannot hoist the body out of the scan); it returns any array,
    summed into the carried scalar that the host fetch forces.

    Pass module VARIABLES through ``args``, never close over them: closed-over
    weights become program constants, and the 300 MB encoder table blows the
    axon relay's remote-compile body limit (HTTP 413, seen r3).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1,))
    def run(args, n):
        def body(acc, i):
            s = fn(i, *args)
            return acc + jnp.sum(s).astype(jnp.float32), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(n))
        return acc

    ts = []
    for n in (k1, k2):
        float(run(args, n))  # compile + warm
        t0 = time.perf_counter()
        float(run(args, n))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


def perturbed(x, i):
    """Loop-variant copy of x: float arrays get +i*1e-6, ints get a rotation."""
    import jax.numpy as jnp

    if jnp.issubdtype(x.dtype, jnp.floating):
        return x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
    return x + (i % 2).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", nargs=2, type=int, default=[8, 24])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--skip-substages", action="store_true")
    ap.add_argument(
        "--fused-stages",
        action="store_true",
        help="measure the resblock substages through the fused Pallas "
        "stage kernel (the TPU inference path, ops/fused_stage.py)",
    )
    args = ap.parse_args()
    k1, k2 = args.iters

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.utils.common import (
        enable_compilation_cache,
        load_json,
    )

    enable_compilation_cache()
    cfg = load_json("/root/reference/configs/model_config.json")
    codec = DistilCodec(cfg)
    mod = codec.module_bf16
    variables = codec.variables

    n_samples = int(args.seconds * SR)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, n_samples + 1)).astype(np.float32) * 0.1
    )

    # --- materialize intermediates once (shapes + realistic values) -------
    mel = jax.jit(lambda v, a: mod.apply(v, a, method="mel"))(variables, audio)
    enc = jax.jit(
        lambda v, m: mod.apply(v, m, method=lambda md, y: md.encoder(y))
    )(variables, mel)
    codes_flat = jax.jit(
        lambda v, e: mod.apply(v, e, method=lambda md, y: md.quantizer.encode(y))
    )(variables, enc)
    g, r = codec.ngroups, codec.nresiduals
    b, _, L = codes_flat.shape
    codes = jnp.transpose(codes_flat.reshape(b, g, r, L), (1, 0, 3, 2))
    K = codec.codec_config.quantizer.codebook_size
    feats = jax.jit(
        lambda v, c: mod.apply(v, c, method=lambda md, y: md.quantizer.decode(y))
    )(variables, codes)

    report = []

    def rec(stage, ms, shape):
        row = {"stage": stage, "ms": round(ms, 2), "shape": list(shape)}
        report.append(row)
        print(json.dumps(row), flush=True)

    rec(
        "mel",
        timed_ms(
            lambda i, v, a: mod.apply(v, perturbed(a, i), method="mel"),
            (variables, audio),
            k1,
            k2,
        ),
        mel.shape,
    )
    rec(
        "encoder",
        timed_ms(
            lambda i, v, m: mod.apply(
                v, perturbed(m, i), method=lambda md, y: md.encoder(y)
            ),
            (variables, mel),
            k1,
            k2,
        ),
        enc.shape,
    )
    rec(
        "vq_search(encode)",
        timed_ms(
            lambda i, v, e: mod.apply(
                v,
                perturbed(e, i),
                method=lambda md, y: md.quantizer.encode(y),
            ).astype(jnp.float32),
            (variables, enc),
            k1,
            k2,
        ),
        codes_flat.shape,
    )
    rec(
        "codebook_decode",
        timed_ms(
            lambda i, v, c: mod.apply(
                v,
                (c + (i % 2)) % K,
                method=lambda md, y: md.quantizer.decode(y),
            ),
            (variables, codes),
            k1,
            k2,
        ),
        feats.shape,
    )
    rec(
        "generator(full)",
        timed_ms(
            lambda i, v, f: mod.apply(
                v,
                perturbed(f, i),
                method=lambda md, y: md.generator(y),
            ),
            (variables, feats),
            k1,
            k2,
        ),
        (args.batch, 256 * L),
    )

    if not args.skip_substages:
        # --- generator internal stages as standalone blocks ----------------
        from distilcodec_nabeel_tpu.models.blocks import (
            Conv1d,
            ConvTranspose1d,
            ParallelBlock,
            _resblock_pack,
            get_padding,
        )

        dcfg = codec.codec_config.decoder
        gparams = variables["params"]["generator"]
        dtype = jnp.bfloat16
        silu = jax.nn.silu

        x = feats.astype(dtype)
        conv_pre = Conv1d(
            dcfg.upsample_initial_channel,
            dcfg.pre_conv_kernel_size,
            padding=get_padding(dcfg.pre_conv_kernel_size),
            use_weight_norm=True,
            dtype=dtype,
        )
        vpre = {"params": gparams["conv_pre"]}
        rec(
            "gen.conv_pre",
            timed_ms(
                lambda i, v, y: conv_pre.apply(v, perturbed(y, i)),
                (vpre, x),
                k1,
                k2,
            ),
            x.shape,
        )
        x = conv_pre.apply(vpre, x)

        for si, (u, k) in enumerate(
            zip(dcfg.upsample_rates, dcfg.upsample_kernel_sizes)
        ):
            ch = dcfg.upsample_initial_channel // (2 ** (si + 1))
            ct = ConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2,
                use_weight_norm=True, dtype=dtype,
            )
            vct = {"params": gparams[f"ups_{si}"]}
            rec(
                f"gen.ups_{si}(x{u})",
                timed_ms(
                    lambda i, v, y, m=ct: m.apply(v, silu(perturbed(y, i))),
                    (vct, x),
                    k1,
                    k2,
                ),
                x.shape,
            )
            x = ct.apply(vct, silu(x))
            blk = ParallelBlock(
                ch,
                dcfg.resblock_kernel_sizes,
                dcfg.resblock_dilation_sizes,
                dtype=dtype,
                pack_maxc=64,
                fused_stage=args.fused_stages,
            )
            vblk = {"params": gparams[f"resblocks_{si}"]}
            rec(
                f"gen.resblocks_{si}(C={ch})",
                timed_ms(
                    lambda i, v, y, m=blk: m.apply(v, perturbed(y, i)),
                    (vblk, x),
                    k1,
                    k2,
                ),
                x.shape,
            )
            x = blk.apply(vblk, x)

        B, T, C = x.shape
        f = _resblock_pack(C, T)
        post = Conv1d(
            1,
            dcfg.post_conv_kernel_size,
            padding=get_padding(dcfg.post_conv_kernel_size),
            use_weight_norm=True,
            dtype=dtype,
            pack=f,
        )
        vpost = {"params": gparams["conv_post"]}

        def post_fn(i, v, y):
            z = silu(perturbed(y, i))
            Bq, Tq, Cq = z.shape
            if f > 1:
                z = z.reshape(Bq, Tq // f, f * Cq)
            z = post.apply(v, z)
            return jnp.tanh(z.astype(jnp.float32))

        rec(
            "gen.conv_post+tanh",
            timed_ms(post_fn, (vpost, x), k1, k2),
            x.shape,
        )

    total = sum(r["ms"] for r in report if not r["stage"].startswith("gen."))
    print(
        json.dumps(
            {
                "stage": "TOTAL(top-level sum)",
                "ms": round(total, 2),
                "audio_seconds_per_s": round(
                    args.batch * args.seconds / (total / 1e3), 1
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
