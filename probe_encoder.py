"""Probe: where does the ConvNeXt encoder's time go? (VERDICT r3 item 6)

The encoder (18 blocks) measures 27.2 ms at b16 x 10 s against a ~22 ms MLP
matmul bound (DESIGN.md roofline).  Per-component timing at each stage's
(C, depth): LayerNorm (fp32 stats), depthwise conv k=7 (shift-FMA), the 4x
MLP with exact GELU (erf — an EUP transcendental on every one of the
(B,T,4C) activations), and the full block, vs the block's matmul-only
floor.

Usage: python probe_encoder.py [--batch 16] [--frames 938] [--iters 3 9]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


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
    ap.add_argument("--frames", type=int, default=938)
    ap.add_argument("--iters", nargs=2, type=int, default=[3, 9])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.models.blocks import ConvNeXtBlock
    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, T = args.batch, args.frames
    k1, k2 = args.iters
    dt = jnp.bfloat16

    # flagship encoder: depths [3,3,9,3] at dims [256,512,768,1024]
    for C, depth in ((256, 3), (512, 3), (768, 9), (1024, 3)):
        x = jnp.asarray(
            rng.standard_normal((B, T, C)).astype(np.float32)
        ).astype(dt)
        blk = ConvNeXtBlock(dim=C, dtype=dt)
        params = blk.init(jax.random.PRNGKey(0), x)

        t_full = timed_ms(
            lambda i, p, xx: blk.apply(p, xx + i.astype(dt) * jnp.asarray(1e-6, dt)),
            (params, x),
            k1,
            k2,
        )

        # MLP-only floor: the two Dense matmuls + exact gelu
        w1 = jnp.asarray(
            rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.02
        ).astype(dt)
        w2 = jnp.asarray(
            rng.standard_normal((4 * C, C)).astype(np.float32) * 0.02
        ).astype(dt)

        def mlp(i, xx, w1, w2, gelu=True):
            h = (xx + i.astype(dt) * jnp.asarray(1e-6, dt)) @ w1
            if gelu:
                h = jax.nn.gelu(h, approximate=False)
            return h @ w2

        t_mlp = timed_ms(mlp, (x, w1, w2), k1, k2)
        t_mm = timed_ms(partial(mlp, gelu=False), (x, w1, w2), k1, k2)

        # LayerNorm alone (fp32 stats like the block's LayerNorm)
        def ln(i, xx):
            h = (xx + i.astype(dt) * jnp.asarray(1e-6, dt)).astype(jnp.float32)
            mu = h.mean(-1, keepdims=True)
            v = ((h - mu) ** 2).mean(-1, keepdims=True)
            return ((h - mu) * jax.lax.rsqrt(v + 1e-6)).astype(dt)

        t_ln = timed_ms(ln, (x,), k1, k2)

        flops = 2 * 2 * B * T * C * 4 * C
        bound_ms = flops / 197e12 * 1e3
        print(
            json.dumps(
                {
                    "C": C,
                    "depth": depth,
                    "block_ms": round(t_full, 3),
                    "mlp_ms": round(t_mlp, 3),
                    "matmuls_ms": round(t_mm, 3),
                    "gelu_ms": round(t_mlp - t_mm, 3),
                    "ln_ms": round(t_ln, 3),
                    "other_ms": round(t_full - t_mlp - t_ln, 3),
                    "matmul_bound_ms": round(bound_ms, 3),
                    "stage_total_ms": round(t_full * depth, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
