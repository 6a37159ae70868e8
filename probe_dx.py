"""Probe: input-gradient (dx) cost of the MSD's strided grouped convs.

XLA differentiates a stride-s conv w.r.t. its input as a conv with
``lhs_dilation=s`` (zero-stuffed input).  If the TPU conv emitter does not
skip the structural zeros, that backward does s x the useful FLOPs.  The
polyphase identity avoids the zeros entirely: for y[t] = sum_k x[t*s+k-p] w[k],
each output residue class r = (n+p) % s of dx is a plain stride-1 correlation
of the upstream gradient g with the sub-sampled kernel taps k == r (mod s):

    dx[n] = sum_{k = r (mod s)} w[k] * g[(n+p-k)/s]

i.e. s independent convs with ~K/s taps each, interleaved — exactly the
useful FLOPs.  This probe times XLA's dx vs the polyphase dx at the MSD's
flagship layer shapes (b16 bf16, dense128-regrouped: fgc = Cin/128) and
value-checks them against each other.

Usage: python probe_dx.py [--batch 16] [--iters 3 9] [--cpu]
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
        float(run(args, n))  # compile + warm
        t0 = time.perf_counter()
        float(run(args, n))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


def conv1d(x, w, stride, pad, fgc, pref):
    import jax

    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=fgc,
        preferred_element_type=pref,
    )


def poly_dx(g, w, stride, pad, fgc, T_in, pref):
    """Polyphase input-gradient of conv1d(x, w, stride, pad, fgc).

    g: (B, T_out, Cout); w: (K, Cin/fgc, Cout); returns (B, T_in, Cin).
    """
    import jax
    import jax.numpy as jnp

    K = w.shape[0]
    s = stride
    if s == 1:
        # dx of a stride-1 conv is a stride-1 conv with the flipped,
        # io-swapped kernel — XLA does this fine already; identity path
        wf = jnp.flip(w, 0)
        # swap in/out: (K, Cin/g, Cout) -> (K, Cout/g, Cin) via grouped blocks
        return _dx_s1(g, wf, pad, fgc, T_in, pref)
    outs = []
    B, T_out, Cout = g.shape
    Cin = w.shape[1] * fgc
    for r in range(s):
        # taps k with k % s == r, in decreasing k (correlation w/ flip)
        ks = [k for k in range(K) if k % s == r]
        if not ks:
            outs.append(jnp.zeros((B, (T_in + s - 1 - r) // s, Cin), g.dtype))
            continue
        # dx[n] with (n+p) % s == r: let n = m*s + ((r - pad) % s) ... use
        # index algebra: n+p-k = s*t  =>  t = (n+p-k)/s.  For fixed residue,
        # write n = m*s + r0 where r0 = (r - pad) % s  and  n+p = m*s + r0 +
        # pad; k = s*j + r  =>  t = m + (r0 + pad - r)/s - j + ...  Simplest
        # robust construction: build the equivalent stride-1 conv over g with
        # sub-kernel w[ks] flipped, then slice the valid range.
        wsub = jnp.stack([w[k] for k in ks[::-1]], 0)  # (Kr, Cin/g, Cout)
        # grouped dx: within each group, contract Cout -> Cin/g
        wT = _swap_io(wsub, fgc)  # (Kr, Cout/g, Cin)
        # output positions n = m*s + r0, m = 0..  ; t index offset:
        r0 = (r - pad) % s
        # for n = m*s + r0: t_j = (n + pad - k_j)/s = m + (r0 + pad - k_j)/s
        # with k_j in ks (all == r mod s, and r0+pad == r mod s) — integers.
        offs = [(r0 + pad - k) // s for k in ks[::-1]]  # ascending by 1
        lo, hi = offs[0], offs[-1]
        # t ranges over m+offs; need g index range [m+lo, m+hi] for
        # m in [0, m_count): pad g so indices [lo, m_count-1+hi] are valid.
        m_count = (T_in - r0 + s - 1) // s
        pad_l = max(0, -lo)
        pad_r = max(0, m_count - 1 + hi - (T_out - 1))
        gp = jnp.pad(g, ((0, 0), (pad_l, pad_r), (0, 0)))
        y = jax.lax.conv_general_dilated(
            gp,
            wT,
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=fgc,
            preferred_element_type=pref,
        )
        # y[m] = sum_j gp[m + j] wT[j]; we want sum at g[m + offs[j]] =>
        # start index m + lo + pad_l  => slice start = lo + pad_l
        start = lo + pad_l
        y = jax.lax.dynamic_slice_in_dim(y, start, m_count, axis=1)
        outs.append(y)
    # interleave residues: out[m*s + r0_r] = outs[r][m]
    Tpad = max(o.shape[1] for o in outs) * s
    buf = jnp.zeros((g.shape[0], Tpad, outs[0].shape[-1]), g.dtype)
    for r in range(s):
        r0 = (r - pad) % s
        o = outs[r]
        buf = buf.at[:, r0 : r0 + o.shape[1] * s : s].set(o)
    return buf[:, :T_in]


def _swap_io(w, fgc):
    """(K, Cin/g, Cout) -> (K, Cout/g, Cin) grouped in/out swap."""
    import jax.numpy as jnp

    K, cing, cout = w.shape
    coutg = cout // fgc
    # (K, cing, g, coutg) -> transpose to (K, coutg, g, cing)
    w4 = w.reshape(K, cing, fgc, coutg)
    w4 = jnp.transpose(w4, (0, 3, 2, 1))
    return w4.reshape(K, coutg, fgc * cing)


def _dx_s1(g, wf, pad, fgc, T_in, pref):
    import jax

    K = wf.shape[0]
    wT = _swap_io(wf, fgc)
    return jax.lax.conv_general_dilated(
        g,
        wT,
        window_strides=(1,),
        padding=[(K - 1 - pad, K - 1 - pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=fgc,
        preferred_element_type=pref,
    )[:, :T_in]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", nargs=2, type=int, default=[3, 9])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--tiny", action="store_true",
        help="1/16-length layers for a fast CPU correctness check",
    )
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    pref = jnp.float32 if dt == jnp.float32 else dt
    rng = np.random.default_rng(0)
    B = args.batch

    # MSD torch-default stack layers 2-5 at scale-0 length 72000, AFTER the
    # dense128 regroup (fgc = Cin/128); (T_in, Cin, Cout, K, s, pad, fgc)
    layers = [
        ("msd_l2", 36000, 128, 256, 41, 2, 20, 1),
        ("msd_l3", 18000, 256, 512, 41, 4, 20, 2),
        ("msd_l4", 4500, 512, 1024, 41, 4, 20, 4),
        ("msd_l5", 1125, 1024, 1024, 41, 1, 20, 8),
    ]
    if args.tiny:
        layers = [
            (n, max(64, t // 16), ci // 4, co // 4, k, s, p, max(1, g // 4))
            for (n, t, ci, co, k, s, p, g) in layers
        ]
    for name, T_in, Cin, Cout, K, s, pad, fgc in layers:
        x = jnp.asarray(
            rng.standard_normal((B, T_in, Cin)).astype(np.float32)
        ).astype(dt)
        w = jnp.asarray(
            rng.standard_normal((K, Cin // fgc, Cout)).astype(np.float32) * 0.02
        ).astype(dt)
        T_out = (T_in + 2 * pad - K) // s + 1
        g = jnp.asarray(
            rng.standard_normal((B, T_out, Cout)).astype(np.float32)
        ).astype(dt)

        def fwd(xx):
            return conv1d(xx, w, s, pad, fgc, pref)

        # value check (fp32 on small slice)
        dx_auto = jax.vjp(fwd, x)[1](g)[0]
        dx_poly = poly_dx(g, w, s, pad, fgc, T_in, pref)
        err = float(
            jnp.max(jnp.abs(dx_auto.astype(jnp.float32) - dx_poly.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(dx_auto.astype(jnp.float32)))) or 1.0

        # perturb the COTANGENT per iteration (not x): dx of a bias-free conv
        # is linear in g and independent of x, so a constant g lets XLA hoist
        # the whole backward out of the timing scan (measured: 0.1 ms bogus)
        t_auto = timed_ms(
            lambda i, xx, gg: jax.vjp(fwd, xx)[1](
                gg + i.astype(dt) * dt.type(1e-6)
            )[0],
            (x, g),
            *args.iters,
        )
        t_poly = timed_ms(
            lambda i, gg: poly_dx(
                gg + i.astype(dt) * dt.type(1e-6), w, s, pad, fgc, T_in, pref
            ),
            (g,),
            *args.iters,
        )
        print(
            json.dumps(
                {
                    "layer": name,
                    "dx_auto_ms": round(t_auto, 2),
                    "dx_poly_ms": round(t_poly, 2),
                    "rel_err": err / scale,
                    "stride": s,
                    "fgc": fgc,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
