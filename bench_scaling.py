"""Multi-device scaling harness: data-parallel batched encode throughput and
efficiency over all visible devices, plus an optional codebook-TP mode.

On a multi-chip slice this measures the BASELINE scaling-efficiency targets
(1 chip -> 1 host -> N hosts); under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N`` it
validates the mechanics.  Prints one JSON line with per-device-count results.

``--codebook-tp`` benches the tensor-parallel VQ search instead: the (32768,
3584) codebook sharded over a ``model`` axis with allreduce-argmin
(codec.use_codebook_sharding; SURVEY §2.2 TP row) at a FIXED global batch —
the win is encode latency per call, not throughput scaling.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codebook-tp", action="store_true")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from distilcodec_nabeel_tpu import DistilCodec, load_model_config

    codec = DistilCodec(
        load_model_config("/root/reference/configs/model_config.json")
    )
    devices = jax.devices()
    seconds, per_device_batch, iters = (
        args.seconds, args.per_device_batch, args.iters,
    )
    sr = 24000
    rng = np.random.default_rng(0)

    def timed_encode(enc, audio):
        res = enc(codec.variables, audio)
        float(jnp.sum(res.codes).astype(jnp.float32))  # warm + compile
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + jnp.sum(
                enc(codec.variables, audio).codes
            ).astype(jnp.float32)
        float(acc)
        return (time.perf_counter() - t0) / iters

    results = {}
    counts = sorted(
        {1, len(devices)} | ({len(devices) // 2} if len(devices) > 2 else set())
    )
    if args.codebook_tp:
        # fixed global batch; vary how many chips the codebook is split over
        B = per_device_batch
        audio = jnp.asarray(
            rng.standard_normal((B, int(seconds * sr) + 1)).astype(np.float32)
            * 0.1
        )
        for n in counts:
            if 32768 % n != 0:
                continue
            if n == 1:
                codec.use_codebook_sharding(None)
            else:
                codec.use_codebook_sharding(
                    Mesh(np.array(devices[:n]), ("model",))
                )
            dt = timed_encode(codec._pick(True, "encode", B), audio)
            results[n] = B * seconds / dt
        codec.use_codebook_sharding(None)
        base = results[min(results)]
        print(
            json.dumps(
                {
                    "metric": "codebook-TP encode throughput (fixed batch)",
                    "unit": "audio-seconds/s",
                    "global_batch": B,
                    "per_shard_count": {
                        str(k): round(v, 1) for k, v in results.items()
                    },
                    "speedup_vs_replicated": {
                        str(k): round(v / base, 3) for k, v in results.items()
                    },
                }
            )
        )
        return

    for n in counts:
        if n < 1:
            continue
        mesh = Mesh(np.array(devices[:n]), ("data",))
        codec.use_data_parallel(mesh)
        B = per_device_batch * n
        audio = jnp.asarray(
            rng.standard_normal((B, int(seconds * sr) + 1)).astype(np.float32)
            * 0.1
        )
        dt = timed_encode(codec._pick(True, "encode", B), audio)
        results[n] = B * seconds / dt

    base = results[min(results)] / min(results)
    print(
        json.dumps(
            {
                "metric": "data-parallel encode throughput",
                "unit": "audio-seconds/s",
                "per_device_count": {str(k): round(v, 1) for k, v in results.items()},
                "scaling_efficiency": {
                    str(k): round(v / (base * k), 3) for k, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
