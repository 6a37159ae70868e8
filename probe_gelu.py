"""Micro-probe: exact-erf GELU vs tanh / sigmoid approximations on TPU.

probe_encoder.py attributed ~1.2 ms/block at C=1024 to the exact GELU's
erf (61M EUP transcendentals).  Before plumbing an approximate-GELU recipe
switch, check the approximations are actually cheaper on the VPU — tanh
and sigmoid are EUP transcendentals too.

Usage: python probe_gelu.py [--iters 5 25]
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
    ap.add_argument("--iters", nargs=2, type=int, default=[5, 25])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((16, 938, 4096)).astype(np.float32)
    ).astype(jnp.bfloat16)
    one = jnp.asarray(1e-6, jnp.bfloat16)

    variants = {
        "copy": lambda h: h,  # baseline: read+write only
        "erf_exact": lambda h: jax.nn.gelu(h, approximate=False),
        "tanh_approx": lambda h: jax.nn.gelu(h, approximate=True),
        "sigmoid_1702": lambda h: h * jax.nn.sigmoid(1.702 * h),
        "silu": jax.nn.silu,
    }
    for name, f in variants.items():
        t = timed_ms(
            lambda i, xx, f=f: f(xx + i.astype(xx.dtype) * one),
            (x,),
            *args.iters,
        )
        print(json.dumps({"variant": name, "ms": round(t, 3)}), flush=True)


if __name__ == "__main__":
    main()
