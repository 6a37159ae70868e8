"""Fused HiFiGAN ParallelBlock stage — one Pallas kernel per decoder stage.

STATUS (r4): numerically correct and tested, but a MEASURED NEGATIVE on v5e
at the flagship decode shapes — kept OPT-IN (``DISTILCODEC_FUSED_STAGE=1``).
See :func:`fused_stage_enabled` for the full attribution; the short version
is that Mosaic serializes the kernel's VPU passes (SiLU, im2col staging,
residuals) with its MXU dots, while XLA's conv pipeline overlaps them.

The design rationale stands and is kept for a future scheduler generation:
the decoder's small-channel resblock stages (C<=128) are the last stages off
their roofline (DESIGN.md "Inference roofline accounting", r3: res3 at 48%,
res4 at 54% of bound): after time-packing, their 18-conv SiLU/residual chains
re-touch the packed (B, S, 128) activations in HBM per conv — 36+ full passes
— and the packed M-tap kernels burn structural-zero FLOPs on the dilated
convs (k=11 d=5 at f=2 computes 27 packed taps of which only 17 carry data).

This kernel runs a WHOLE ParallelBlock (reference: ParralelBlock of 3 x
ResBlock1, distilcodec/models/generators.py:118-147 + convnext_utils.py:
30-142) tile-resident in VMEM:

* grid (B, S-tiles); each program holds an extended tile (halo = the stage's
  receptive field) of the packed activations and computes all 18 convs, the
  SiLU/residual chain, and the 3-resblock mean without touching HBM;
* each conv is a sum of shifted-slice matmuls over its NONZERO packed taps
  only (offsets precomputed statically from the conv1d_packed_frames tap
  math, ops/conv1d.py:133-182), grouped into chunks of up to 8 taps so each
  MXU dot contracts K = 8*128 = 1024;
* the halo is provided by passing the previous/current/next S-tile as three
  blocked inputs (standard pipeline double-buffering, no manual DMA); frames
  outside [0, S) are re-zeroed by a mask after every conv, which reproduces
  the per-conv zero-padding semantics of the unfused path exactly;
* accumulation is fp32 per conv (the MXU's native accumulator), rounded to
  the compute dtype once per conv output with the bias added in that dtype —
  the same epilogue policy as models.blocks.Conv1d's packed branch.

Numerics: identical tap products in fp32 accumulation; summation ORDER
differs from XLA's single M-tap conv (and skipped taps contribute exact
zeros), so results match the unfused packed path to float round-off, not to
the bit (tests assert allclose; token ids are unaffected — this runs in the
decoder only).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ConvTaps:
    """Static tap structure of one packed conv (kernel K, dilation d) on an
    f-packed layout: nonzero frame offsets and, per offset, the (k, b, j)
    weight-block scatter (w[k] lands at rows [b*C,(b+1)*C), cols
    [j*C,(j+1)*C) of the (F, F) tap matrix — conv1d_packed_frames math)."""

    offsets: tuple[int, ...]
    scatter: tuple[tuple[tuple[int, int, int], ...], ...]  # per offset


def conv_taps(kernel_size: int, dilation: int, pack: int, channels: int) -> ConvTaps:
    """Nonzero packed taps of a SAME-length conv (padding=(K-1)*d/2)."""
    k, d, f = kernel_size, dilation, pack
    p = (k * d - d) // 2
    P = _round_up(p, f)
    lf = P // f
    shift = P - p
    blocks: dict[int, list[tuple[int, int, int]]] = {}
    for j in range(f):
        for kk in range(k):
            o = j + shift + kk * d
            a, b = divmod(o, f)
            blocks.setdefault(a - lf, []).append((kk, b, j))
    offs = tuple(sorted(blocks))
    return ConvTaps(offs, tuple(tuple(blocks[o]) for o in offs))


@dataclasses.dataclass(frozen=True)
class StagePlan:
    """Static plan for one fused ParallelBlock stage."""

    channels: int
    pack: int
    kernel_sizes: tuple[int, ...]
    dilation_sizes: tuple[tuple[int, ...], ...]
    convs: tuple[ConvTaps, ...]  # 2 per dilation step, resblock-major
    tap_starts: tuple[int, ...]  # row offset of each conv's taps in the array
    n_taps: int
    left: int  # halo + compute-pad frames on each side (sublane-rounded)
    right: int
    pad: int  # per-conv compute margin = max |offset| over all convs

    @property
    def features(self) -> int:
        return self.pack * self.channels


def build_stage_plan(
    channels: int,
    pack: int,
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
) -> StagePlan:
    convs = []
    halo_l = halo_r = 0
    for k, ds in zip(kernel_sizes, dilation_sizes):
        hl = hr = 0
        for d in ds:
            for dd in (d, 1):  # convs1_i (dilated) then convs2_i (d=1)
                ct = conv_taps(k, dd, pack, channels)
                convs.append(ct)
                hl += max(0, -min(ct.offsets))
                hr += max(0, max(ct.offsets))
        halo_l = max(halo_l, hl)
        halo_r = max(halo_r, hr)
    pad = max(
        max(-min(c.offsets), max(c.offsets)) for c in convs
    )
    starts, total = [], 0
    for c in convs:
        starts.append(total)
        total += len(c.offsets)
    return StagePlan(
        channels=channels,
        pack=pack,
        kernel_sizes=tuple(kernel_sizes),
        dilation_sizes=tuple(tuple(d) for d in dilation_sizes),
        convs=tuple(convs),
        tap_starts=tuple(starts),
        n_taps=total,
        left=_round_up(halo_l + pad, 8),
        right=_round_up(halo_r + pad, 8),
        pad=pad,
    )


def fold_wn(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """w = g * v / ||v|| over (K, Cin, Cout), g per output channel (torch
    weight_norm dim=0; same math as models.blocks.Conv1d)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / norm)


def build_tap_arrays(
    plan: StagePlan, params: dict, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter the 18 folded conv kernels into the stacked tap matrices.

    params: the ParallelBlock variable subtree {blocks_i: {convs1_j|convs2_j:
    {v, g, bias}}}.  Returns (taps (n_taps*F, F) in ``dtype``, biases
    (18, F) fp32) — biases pre-tiled across the pack factor like the packed
    conv path (models.blocks.Conv1d pack>1 branch)."""
    F, C, f = plan.features, plan.channels, plan.pack
    mats, biases = [], []
    ci = 0
    for bi, ds in enumerate(plan.dilation_sizes):
        blk = params[f"blocks_{bi}"]
        for si in range(len(ds)):
            for name in (f"convs1_{si}", f"convs2_{si}"):
                cp = blk[name]
                w = fold_wn(cp["v"], cp["g"]).astype(jnp.float32)
                ct = plan.convs[ci]
                m = jnp.zeros((len(ct.offsets), F, F), jnp.float32)
                for oi, sc in enumerate(ct.scatter):
                    for kk, b, j in sc:
                        m = m.at[oi, b * C : (b + 1) * C, j * C : (j + 1) * C].add(
                            w[kk]
                        )
                mats.append(m.reshape(len(ct.offsets) * F, F))
                biases.append(jnp.tile(cp["bias"], f))
                ci += 1
    taps = jnp.concatenate(mats, axis=0).astype(dtype)
    return taps, jnp.stack(biases).astype(jnp.float32)


def _stage_kernel(plan: StagePlan, s_valid: int, ts: int, group: int, dtype):
    """Build the Pallas kernel body (python-unrolled over convs and taps)."""
    LEFT, RIGHT, PAD = plan.left, plan.right, plan.pad
    F = plan.features
    EB = LEFT + ts + RIGHT
    L = EB - 2 * PAD

    buf = jnp.float32

    def _silu(v):
        # buffers are f32 (see below); jax.nn.silu on bf16 also trips a
        # Mosaic vector.broadcast element-type verification error, so the
        # f32 form is both the fast and the lowerable one
        return v * jax.lax.logistic(v)

    def kernel(
        prev_ref, cur_ref, next_ref, taps_ref, bias_ref, out_ref, im2a, im2b
    ):
        si = pl.program_id(1)
        x = jnp.concatenate(
            [prev_ref[0, ts - LEFT :, :], cur_ref[0], next_ref[0, :RIGHT, :]],
            axis=0,
        )  # (EB, F)
        # global packed-frame index of each row; frames outside [0, s_valid)
        # must read as zero (conv zero-padding semantics) and must be
        # RE-zeroed after every conv (a conv's bias would otherwise leak into
        # the virtual padding).  NOTE the mask is frame-range only: rows in
        # [0, PAD) / [EB-PAD, EB) are real halo data read by the convs; conv
        # OUTPUTS are zeroed there structurally (zpad concat below).
        rows = jax.lax.broadcasted_iota(jnp.int32, (EB, 1), 0)
        gf = rows + si * ts - LEFT
        mask = (gf >= 0) & (gf < s_valid)
        # activations are held in f32 INSIDE the kernel: bf16's (16, 128)
        # tiling makes the ~100 sublane-SHIFTED tap slices per tile pay a
        # cross-tile interleave each (measured: the bf16-buffer variant ran
        # SLOWER than unfused), while f32's (8, 128) tiling shifts by whole
        # sublanes; the cast to the MXU's bf16 happens inside the staging
        # store.  Conv outputs are still rounded through ``dtype`` (the
        # unfused epilogue's rounding point) before re-entering f32 buffers,
        # so intermediate VALUES stay bf16-representable like the unfused
        # path.
        x = jnp.where(mask, x, 0).astype(buf)

        zpad = jnp.zeros((PAD, F), buf)

        def conv(t, ci):
            ct = plan.convs[ci]
            start = plan.tap_starts[ci]
            offs = ct.offsets
            chunks = [offs[g0 : g0 + group] for g0 in range(0, len(offs), group)]

            # assemble each im2col chunk through VMEM scratch: a lane concat
            # of sublane-SHIFTED slices is not lowerable on Mosaic ("offset
            # mismatch on non-concat dimension"); staging each shifted slice
            # through a store re-lays it out (f32 shift + cast), and the
            # single K=group*F dot feeds the MXU a deep contraction instead
            # of per-tap K=F dots.  Two alternating scratches with the NEXT
            # chunk staged before the CURRENT chunk's dot give the scheduler
            # independent VPU/MXU work to overlap.
            def stage(chunk, scr):
                for i, o in enumerate(chunk):
                    scr[:, i * F : (i + 1) * F] = t[
                        PAD + o : PAD + o + L, :
                    ].astype(dtype)

            scr = (im2a, im2b)
            stage(chunks[0], scr[0])
            acc = jnp.zeros((L, F), jnp.float32)
            for idx, chunk in enumerate(chunks):
                if idx + 1 < len(chunks):
                    stage(chunks[idx + 1], scr[(idx + 1) % 2])
                operand = scr[idx % 2][:, : len(chunk) * F]
                g0 = idx * group
                w = taps_ref[(start + g0) * F : (start + g0 + len(chunk)) * F, :]
                acc = acc + jnp.dot(
                    operand, w, preferred_element_type=jnp.float32
                )
            # round through `dtype` + bias in `dtype`: the unfused packed
            # conv's exact epilogue (models.blocks.Conv1d pack>1 branch)
            y = (acc.astype(dtype) + bias_ref[ci, :].astype(dtype)[None, :]).astype(buf)
            y = jnp.concatenate([zpad, y, zpad], axis=0)
            return jnp.where(mask, y, 0)

        acc_rb = None
        ci = 0
        for _bi, ds in enumerate(plan.dilation_sizes):
            h = x
            for _si in range(len(ds)):
                t = _silu(h)
                t = conv(t, ci)
                t = _silu(t)
                t = conv(t, ci + 1)
                h = h + t
                ci += 2
            acc_rb = h if acc_rb is None else acc_rb + h
        y = acc_rb / len(plan.dilation_sizes)
        out_ref[0] = y[LEFT : LEFT + ts, :].astype(dtype)

    return kernel, EB, L


@functools.partial(
    jax.jit,
    static_argnames=("plan", "tile_s", "group", "interpret"),
)
def fused_parallel_block(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    biases: jnp.ndarray,
    *,
    plan: StagePlan,
    tile_s: int = 1024,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: packed (B, S, F) -> (B, S, F), F = pack*channels.

    taps/biases from :func:`build_tap_arrays`.  ``tile_s`` is the VMEM tile
    length in packed frames (halo overhead = (left+right)/tile_s); ``group``
    is the tap-chunk size per MXU dot (K = group*F per contraction)."""
    B, S, F = x.shape
    assert F == plan.features, (F, plan)
    dtype = x.dtype
    ts = min(tile_s, _round_up(S, 8))
    ts = max(ts, _round_up(max(plan.left, plan.right), 8))
    n_tiles = -(-S // ts)
    s_pad = n_tiles * ts
    if s_pad != S:
        x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))

    kernel, EB, L = _stage_kernel(plan, S, ts, group, dtype)

    flops = 2 * B * n_tiles * L * F * F * plan.n_taps
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, ts, F),
                lambda b, s: (b, jnp.maximum(s - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ts, F), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ts, F),
                lambda b, s, n=n_tiles: (b, jnp.minimum(s + 1, n - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                taps.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                biases.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ts, F), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, F), dtype),
        scratch_shapes=[
            pltpu.VMEM((L, group * F), dtype),
            pltpu.VMEM((L, group * F), dtype),
        ],
        # the f32 working buffers + resident taps sit just above Mosaic's
        # conservative 16 MB default scoped-vmem limit at tile_s=1024;
        # v5e's physical VMEM accommodates the raised cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                __import__("os").environ.get(
                    "DISTILCODEC_FUSED_VMEM", 64 * 1024 * 1024
                )
            )
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * s_pad * F * x.dtype.itemsize
            + taps.size * taps.dtype.itemsize,
            transcendentals=12 * B * s_pad * F,  # silu sigmoids
        ),
        interpret=interpret,
    )(x, x, x, taps, biases)
    return out[:, :S] if s_pad != S else out


def fused_stage_enabled() -> bool:
    """``DISTILCODEC_FUSED_STAGE``: gate for the fused decoder stages.

    Default OFF — a r4 MEASURED NEGATIVE at the flagship decode shapes
    (B=16 x 10 s, v5e): the whole-stage kernel is numerically correct but
    ran res2/res3/res4 at 43/44/36 ms vs 25/31/26 ms unfused.  Attribution
    (per-program accounting, matches measurement within ~10%): the kernel is
    VPU-SERIALIZATION-bound — ~30 f32 SiLU passes (~13.5 us/program on the
    EUP), ~60-100 shifted im2col staging stores (~9 us), and the residual/
    mask/epilogue passes all serialize with the MXU dots (~13 us) because
    Mosaic schedules them in program order, while XLA's conv pipeline
    overlaps its (admittedly structural-zero-inflated) MXU work with fused
    elementwise epilogues and HBM streaming.  Variants measured: bf16 vs
    f32 buffers (sublane-shift cost — no change), tile 1024 vs 2048 (worse),
    tap-chunk 4/8/16, double-buffered staging with the next chunk issued
    before the current dot (no overlap materialized).  Even perfect
    VPU/MXU overlap would only reach ~parity, so the lever is parked:
    ``1`` forces it on (the kernel stays correct and tested) for future
    Mosaic scheduler generations.
    """
    import os

    return os.environ.get("DISTILCODEC_FUSED_STAGE", "0") == "1"
