"""Throughput benchmark: encode+decode round trip on the flagship full-size
codec, reported as audio-seconds processed per wall-clock second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the reference PyTorch implementation measured
on this host (the reference repo publishes no machine-performance numbers —
BASELINE.md; its CUDA path has no GPU here, so the baseline is torch-CPU,
measured once by ``python bench.py --measure-baseline`` and cached in
bench_baseline.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
SECONDS = 10.0
BATCH = 16
SR = 24000


def bench_ours(iters: int = 40, fused: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()

    with open("/root/reference/configs/model_config.json") as f:
        cfg = json.load(f)
    codec = DistilCodec(cfg)

    n_samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples + 1)).astype(np.float32) * 0.1
    )

    # bf16 conv stacks + fp32 VQ distance: the production inference mode
    # (reference demo encodes with enable_bfloat16=True, distil_codec.py:701)
    def round_trip(variables, a):
        """encode -> codes -> decode, returning data-dependent scalars."""
        codes_flat = codec.module_bf16.apply(
            variables, a, method="encode_codes"
        )  # (B, G*R, L)
        g, r = cfg["quantizer"]["n_groups"], cfg["quantizer"]["n_codebooks"]
        b, _, L = codes_flat.shape
        codes = jnp.transpose(
            codes_flat.reshape(b, g, r, L), (1, 0, 3, 2)
        )  # (G, B, L, R)
        wave = codec.module_bf16.apply(variables, codes, method="decode_codes")
        return jnp.sum(wave) + jnp.sum(codes_flat).astype(jnp.float32)

    if fused:
        # One dispatch for the whole timed run: lax.scan over the round trip,
        # the input perturbed per step (scan bodies re-execute every step;
        # the perturbation additionally forecloses any compiler elision).
        # This measures steady-state device throughput — on this tunneled
        # backend each dispatch costs ~80 ms of host latency that a
        # production TPU serving path would not pay (see DESIGN.md timing
        # methodology) and that per-iteration dispatch benching double-counts.
        from functools import partial

        @partial(jax.jit, static_argnums=(2,))
        def timed_run(variables, a, n):
            def body(acc, i):
                s = round_trip(variables, a + (i.astype(jnp.float32) * 1e-6))
                return acc + s, ()

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(n)
            )
            return acc

        # warm up the EXACT program (n is static: another n is another
        # compilation, which must not land inside the timed region)
        float(timed_run(codec.variables, audio, iters))
        t0 = time.perf_counter()
        acc = timed_run(codec.variables, audio, iters)
        float(acc)  # host fetch forces the full dependency chain
        dt = time.perf_counter() - t0
    else:  # --dispatch-per-iter: includes per-call host dispatch latency
        rt = jax.jit(round_trip)
        float(rt(codec.variables, audio))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + rt(codec.variables, audio)
        float(acc)
        dt = time.perf_counter() - t0

    audio_seconds = BATCH * SECONDS * iters
    return {
        "audio_seconds_per_s": audio_seconds / dt,
        "wall_s": dt,
        "iters": iters,
        "batch": BATCH,
        "clip_seconds": SECONDS,
        "n_devices": len(jax.devices()),
        "fused": fused,
    }


def measure_baseline(iters: int = 1) -> dict:
    """Reference torch implementation, CPU, same workload (run manually)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from reference_loader import load_reference

    import torch

    ref = load_reference()
    with open("/root/reference/configs/model_config.json") as f:
        cfg = json.load(f)

    enc = ref.models.encoders.ConvNeXtEncoder(
        input_channels=cfg["encoder"]["input_channels"],
        depths=cfg["encoder"]["depths"],
        dims=cfg["encoder"]["dims"],
        drop_path_rate=cfg["encoder"]["drop_path_rate"],
        kernel_size=cfg["encoder"]["kernel_size"],
    ).eval()
    qcfg = dict(cfg["quantizer"])
    qcfg.pop("quantizer_type")
    qcfg.pop("levels", None)
    quant = ref.vector_quantization.grfvq.DownsampleGRVQ(**qcfg).eval()
    dcfg = dict(cfg["decoder"])
    gen = ref.models.generators.HiFiGANGenerator(**dcfg).eval()
    mel = ref.models.mel_spec.LogMelSpectrogram(
        sample_rate=SR,
        n_fft=cfg["spec_transform"]["n_fft"],
        win_length=cfg["spec_transform"]["win_size"],
        hop_length=cfg["spec_transform"]["hop_size"],
        n_mels=cfg["spec_transform"]["num_mels"],
        f_min=cfg["spec_transform"]["fmin"],
        f_max=cfg["spec_transform"]["fmax"],
    )

    n_samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    audio = torch.from_numpy(
        rng.standard_normal((BATCH, n_samples + 1)).astype(np.float32) * 0.1
    )

    with torch.no_grad():
        # warmup
        m = mel(audio[:1])
        e = enc(m)
        q = quant(e)
        _ = gen(q.quantized)

        t0 = time.perf_counter()
        for _ in range(iters):
            m = mel(audio)
            e = enc(m)
            q = quant(e)
            w = gen(q.quantized)
        dt = time.perf_counter() - t0

    audio_seconds = BATCH * SECONDS * iters
    return {
        "audio_seconds_per_s": audio_seconds / dt,
        "wall_s": dt,
        "iters": iters,
        "hardware": "cpu (reference is CUDA/torch; no GPU on this host)",
    }


def _run_json_subprocess(cmd: list, timeout_s: float) -> dict | None:
    """Run a bench subprocess and parse its last JSON stdout line.

    Each measurement runs in its OWN process because only one process may
    hold the tunneled TPU at a time (a second silently contends) — the
    orchestrating parent never imports jax."""
    import subprocess

    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                return None
    return None


# the round-4 production training recipe: bf16 generator+discriminator
# compute, tile-grouped (dense128) MSD conv lowering, CHAIN-packed MS-STFT
# stack, remat off.  Measured 69.66 train-au-s/s/chip at b16x72000
# (0.689 s/step) vs 56.11 with round 3's per-conv freq packing — the chain
# keeps activations W-packed across all six convs of every scale (no
# per-conv pack/unpack relayouts; msstftd.DiscriminatorSTFT._chain_call)
# and the frame-free windowed DFT removes the STFT's frames tensor
# (dsp/stft._windowed_spec).
TRAIN_BENCH_CMD = [
    "bench_train.py",
    "--batch",
    "16",
    "--gen-dtype",
    "bfloat16",
    "--disc-dtype",
    "bfloat16",
    "--no-gen-remat",
    "--grouped-conv",
    "dense128",
    "--msstft-pack",
    "chain",
]


def main():
    if "--measure-baseline" in sys.argv:
        result = measure_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    if "--roundtrip-only" in sys.argv or "--dispatch-per-iter" in sys.argv:
        ours = bench_ours(fused="--dispatch-per-iter" not in sys.argv)
        print(json.dumps(ours), flush=True)
        return

    # Orchestrator (the driver's entry point): round-trip first — the
    # primary, most robust metric — then the training-step throughput
    # (VERDICT r2: driver-visible perf must reflect training progress too).
    here = os.path.dirname(os.path.abspath(__file__))
    rt = _run_json_subprocess(
        [sys.executable, os.path.join(here, "bench.py"), "--roundtrip-only"],
        timeout_s=float(os.environ.get("DISTILCODEC_BENCH_RT_TIMEOUT", 1800)),
    )
    # the train step is cold-compile-expensive on the tunneled backend
    # (~27 min uncached); the persistent compile cache makes re-runs ~3 min.
    # Cap it so a cold cache degrades to train=null instead of eating the
    # driver's whole bench budget.
    train = _run_json_subprocess(
        [sys.executable, os.path.join(here, TRAIN_BENCH_CMD[0])]
        + TRAIN_BENCH_CMD[1:],
        # cache-warm measured 3m37s on an idle host; the 900 s default
        # timed out once under a concurrent CPU-suite run (r4), so leave
        # margin — a cold cache still degrades to train=null rather than
        # eating the driver's whole budget
        timeout_s=float(
            os.environ.get("DISTILCODEC_BENCH_TRAIN_TIMEOUT", 1500)
        ),
    )

    if train is not None:
        print(
            json.dumps(
                {
                    "metric": "GAN train-step throughput per chip",
                    "value": train.get("value"),
                    "unit": "audio-seconds/s/chip",
                    "vs_baseline": None,  # the reference ships no train loop
                    "step_time_s": train.get("step_time_s"),
                    "batch": train.get("batch"),
                }
            ),
            flush=True,
        )

    baseline_rate = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline_rate = json.load(f).get("audio_seconds_per_s")
    rt_rate = rt.get("audio_seconds_per_s") if rt else None
    vs = rt_rate / baseline_rate if (rt_rate and baseline_rate) else None
    print(
        json.dumps(
            {
                "metric": "encode+decode round-trip throughput per chip",
                "value": round(rt_rate, 2) if rt_rate else None,
                "unit": "audio-seconds/s/chip",
                "vs_baseline": round(vs, 2) if vs else None,
                "train_au_s_per_chip": train.get("value") if train else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
