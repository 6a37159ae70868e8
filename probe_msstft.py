"""Probe: where does the MS-STFT discriminator's time go?

The family costs ~280 ms of the b16 production train step, yet its conv
stack's MXU floor is ~6 ms and its HBM floor ~4 ms per forward — a ~10x gap
no other stage in this codebase shows.  Times, per scale and total:

  * stft      — stft_complex alone (framing + DFT matmul, fp32 HIGHEST)
  * full      — the whole DiscriminatorSTFT forward
  * (full - stft) ~= the 6-conv stack

at b16 x 72000, bf16 conv compute, freq_pack 4 (the production recipe), and
the same with pack disabled for comparison.

Usage: python probe_msstft.py [--batch 16] [--iters 3 9] [--pack 4]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

SCALES = [(1024, 256, 1024), (2048, 512, 2048), (512, 128, 512), (256, 64, 256), (128, 32, 128)]


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
        float(run(args, n))
        t0 = time.perf_counter()
        float(run(args, n))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=71936)
    ap.add_argument("--iters", nargs=2, type=int, default=[3, 9])
    ap.add_argument(
        "--pack",
        type=lambda s: s if s == "chain" else int(s),
        default=4,
    )
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.dsp.stft import stft_complex
    from distilcodec_nabeel_tpu.models.msstftd import DiscriminatorSTFT
    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal((args.batch, args.segment)) * 0.1).astype(np.float32)
    ).astype(dt)

    def rec(**kw):
        print(json.dumps(kw), flush=True)

    k1, k2 = args.iters
    tot_stft = tot_full = 0.0
    for n_fft, hop, win in SCALES:
        t_stft = timed_ms(
            lambda i, xx, n_fft=n_fft, hop=hop, win=win: stft_complex(
                (xx + i.astype(xx.dtype) * xx.dtype.type(1e-6)).astype(
                    jnp.float32
                ),
                n_fft,
                hop,
                win,
                normalized=True,
            ),
            (x,),
            k1,
            k2,
        )
        d = DiscriminatorSTFT(
            filters=32, n_fft=n_fft, hop_length=hop, win_length=win,
            freq_pack=args.pack,
        )
        params = d.init(jax.random.PRNGKey(0), x)
        t_full = timed_ms(
            lambda i, p, xx, d=d: d.apply(
                p, xx + i.astype(xx.dtype) * xx.dtype.type(1e-6)
            )[0],
            (params, x),
            k1,
            k2,
        )
        rec(
            scale=n_fft,
            stft_ms=round(t_stft, 2),
            full_ms=round(t_full, 2),
            convs_ms=round(t_full - t_stft, 2),
            pack=args.pack,
        )
        tot_stft += t_stft
        tot_full += t_full
    rec(
        scale="all",
        stft_ms=round(tot_stft, 2),
        full_ms=round(tot_full, 2),
        convs_ms=round(tot_full - tot_stft, 2),
        pack=args.pack,
    )


if __name__ == "__main__":
    main()
