"""Multi-device scaling harness: data-parallel batched encode+decode
throughput and efficiency over all visible devices.

On a multi-chip slice this measures the BASELINE scaling-efficiency targets
(1 chip -> 1 host -> N hosts); under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N`` it
validates the mechanics.  Prints one JSON line with per-device-count results.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from distilcodec_nabeel_tpu import DistilCodec, load_model_config

    codec = DistilCodec(
        load_model_config("/root/reference/configs/model_config.json")
    )
    devices = jax.devices()
    seconds, per_device_batch, iters = 10.0, 4, 10
    sr = 24000
    rng = np.random.default_rng(0)

    results = {}
    counts = sorted({1, len(devices)} | ({len(devices) // 2} if len(devices) > 2 else set()))
    for n in counts:
        if n < 1:
            continue
        mesh = Mesh(np.array(devices[:n]), ("data",))
        codec.use_data_parallel(mesh)
        B = per_device_batch * n
        audio = jnp.asarray(
            rng.standard_normal((B, int(seconds * sr) + 1)).astype(np.float32) * 0.1
        )
        enc = codec._jit[True]["encode"]
        res = enc(codec.variables, audio)
        float(jnp.sum(res.codes).astype(jnp.float32))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + jnp.sum(
                enc(codec.variables, audio).codes
            ).astype(jnp.float32)
        float(acc)
        dt = (time.perf_counter() - t0) / iters
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
