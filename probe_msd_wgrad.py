"""Probe: per-layer weight-gradient cost of the MSD's dense128 convs.

msd_dgrad is the largest single training stage post-chain (78.6 ms at b8,
~157 at b16; DESIGN.md r4 attribution).  Its dx part measured small
(probe_dx.py: ~10 ms/scale-0 at b16), so the wgrads carry the rest.  This
probe times each scale-0 layer's standalone wgrad (fwd + grad w.r.t. the
kernel of a scalar loss) at b16 bf16 after the dense128 regroup, against
the layer's useful-FLOP bound — to decide whether a Pallas tap-resident
wgrad kernel is worth building in round 5.

Usage: python probe_msd_wgrad.py [--batch 16] [--iters 3 9]
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
    ap.add_argument("--iters", nargs=2, type=int, default=[3, 9])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    pref = jnp.float32 if dt == jnp.float32 else dt
    rng = np.random.default_rng(0)
    B = args.batch
    k1, k2 = args.iters

    # scale-0 MSD torch-default layers after the dense128 regroup:
    # (name, T_in, Cin, Cout, K, stride, pad, fgc)
    layers = [
        ("msd_l0", 72000, 1, 128, 15, 1, 7, 1),
        ("msd_l1", 72000, 128, 128, 41, 2, 20, 1),
        ("msd_l2", 36000, 128, 256, 41, 2, 20, 1),
        ("msd_l3", 18000, 256, 512, 41, 4, 20, 2),
        ("msd_l4", 4500, 512, 1024, 41, 4, 20, 4),
        ("msd_l5", 1125, 1024, 1024, 41, 1, 20, 8),
        ("msd_l6", 1125, 1024, 1024, 5, 1, 2, 8),
    ]
    for name, T_in, Cin, Cout, K, s, pad, fgc in layers:
        x = jnp.asarray(
            rng.standard_normal((B, T_in, Cin)).astype(np.float32)
        ).astype(dt)
        w = jnp.asarray(
            rng.standard_normal((K, Cin // fgc, Cout)).astype(np.float32) * 0.02
        ).astype(dt)
        T_out = (T_in + 2 * pad - K) // s + 1
        ct = jnp.asarray(
            rng.standard_normal((B, T_out, Cout)).astype(np.float32)
        ).astype(dt)

        def wgrad(i, xx, ww, cc):
            # vjp with a perturbed cotangent: the unused primal output is
            # DCE'd, so this times the wgrad conv alone (probe_dx.py
            # methodology — a constant cotangent gets loop-hoisted)
            def f(wv):
                return jax.lax.conv_general_dilated(
                    xx,
                    wv,
                    window_strides=(s,),
                    padding=[(pad, pad)],
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    feature_group_count=fgc,
                    preferred_element_type=pref,
                )

            return jax.vjp(f, ww)[1](
                cc + i.astype(cc.dtype) * jnp.asarray(1e-6, cc.dtype)
            )[0]

        t = timed_ms(wgrad, (x, w, ct), k1, k2)
        flops = 2 * B * T_out * K * (Cin // fgc) * Cout
        bound = flops / 197e12 * 1e3
        print(
            json.dumps(
                {
                    "layer": name,
                    "wgrad_ms": round(t, 2),
                    "flop_bound_ms": round(bound, 3),
                    "fgc": fgc,
                    "stride": s,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
