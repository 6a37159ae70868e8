"""One-shot encode latency: VQ search modes compared at the flagship shape.

"One-shot" = a single user-facing ``codec.encode`` call (one dispatch, host
fetch of the codes) — the serving pattern where the cached-int8 codebook
(``DistilCodec.cache_int8_codebook``) is designed to win: the per-call
codebook requantization that made ``int8`` lose inside fused scans is hoisted
to load time.  Also verifies token-id agreement between modes on real audio
(the reference's own org_audios set).

Timing note (DESIGN.md): each dispatch on the tunneled backend carries
~80 ms host latency; it is paid identically by every mode so the COMPARISON
is fair, and per-call latency is exactly what a one-shot caller experiences.
Medians over ``--calls`` dispatches.

Usage: python bench_encode_oneshot.py [--batch 16] [--seconds 10]
                                      [--calls 12] [--modes high,int8_cached]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SR = 24000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--calls", type=int, default=12)
    ap.add_argument("--modes", default="high,int8,int8_cached")
    args = ap.parse_args()

    import jax.numpy as jnp

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache
    from distilcodec_nabeel_tpu.utils import audio_io

    enable_compilation_cache()
    with open("/root/reference/configs/model_config.json") as f:
        cfg = json.load(f)

    n_samples = int(args.seconds * SR)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, n_samples + 1)).astype(np.float32)
        * 0.1
    )
    # real audio for the token-agreement check
    wav, _ = audio_io.load_wav(
        "/root/reference/data/org_audios/0006.wav", sr=SR
    )

    results, token_ids = {}, {}
    for mode in args.modes.split(","):
        if mode == "high":
            os.environ.pop("DISTILCODEC_VQ_PRECISION", None)
        else:
            os.environ["DISTILCODEC_VQ_PRECISION"] = mode
        codec = DistilCodec(cfg)  # fresh trace per mode (env read at trace)
        if mode == "int8_cached":
            codec.cache_int8_codebook()
        enc = codec._pick(True, "encode", args.batch)

        def one_call(a):
            res = enc(codec.variables, a)
            return int(jnp.sum(res.codes))  # host fetch = the one-shot cost

        one_call(audio)  # compile + warm
        times = []
        for i in range(args.calls):
            a = audio + jnp.float32(i) * 1e-6
            t0 = time.perf_counter()
            one_call(a)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        results[mode] = {
            "median_call_s": round(med, 4),
            "audio_seconds_per_s": round(args.batch * args.seconds / med, 1),
        }
        token_ids[mode] = codec.encode_to_token_ids(
            [(wav, SR)], raw_audio=True, plus_offset=False
        )[0]
        os.environ.pop("DISTILCODEC_VQ_PRECISION", None)

    base = args.modes.split(",")[0]
    flips = {
        m: int(np.sum(np.asarray(token_ids[m]) != np.asarray(token_ids[base])))
        for m in token_ids
    }
    print(
        json.dumps(
            {
                "metric": "one-shot encode latency by VQ search mode",
                "batch": args.batch,
                "clip_seconds": args.seconds,
                "per_mode": results,
                "speedup_vs_first": {
                    m: round(
                        results[base]["median_call_s"]
                        / results[m]["median_call_s"],
                        3,
                    )
                    for m in results
                },
                "token_flips_vs_first": flips,
                "tokens_compared": len(token_ids[base]),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
