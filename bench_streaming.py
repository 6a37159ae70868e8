"""Live-serving latency of the streaming paths on the flagship codec.

Drives ``StreamingEncoder`` / ``StreamingDecoder`` (streaming.py) exactly the
way a live caller would — one chunk per dispatch, host round trip included —
and reports per-chunk wall latency and the real-time factor (audio seconds
produced per wall second).  Unlike bench.py's fused-scan throughput number,
this measures the latency-bound single-stream pattern, so on this tunneled
backend the ~80 ms/dispatch host relay cost is INCLUDED (a co-located
production host would not pay it; treat the numbers as upper bounds and the
RTF as a lower bound — DESIGN.md "timing methodology").

Usage: python bench_streaming.py [--chunk 32] [--seconds 20] [--bf16]
Prints one JSON line per direction.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

SR = 24000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32, help="code frames per chunk")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument(
        "--halo", type=int, default=None,
        help="decoder halo override in code frames (reduced-halo low-latency "
        "mode; default = exact receptive-field halo; error bound per halo: "
        "bench_halo_error.py)",
    )
    ap.add_argument(
        "--streams", type=int, default=1,
        help="N synchronized streams per dispatch (multi-stream serving; "
        "aggregate RTF = N * chunk_audio / latency)",
    )
    args = ap.parse_args()

    import jax  # noqa: F401

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.streaming import StreamingDecoder, StreamingEncoder
    from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache, load_json

    enable_compilation_cache()
    cfg = load_json("/root/reference/configs/model_config.json")
    codec = DistilCodec(cfg)

    rng = np.random.default_rng(0)
    N = args.streams
    n = int(args.seconds * SR)
    audio = (rng.standard_normal((N, n)) * 0.1).astype(np.float32)

    def _as_multi(x):
        """Coerce a streamer output to its n_streams>1 shape (lead N axis)."""
        return x if N > 1 else x[None]

    # ---- encoder: feed chunk-sized sample blocks, time steady-state pushes
    enc = StreamingEncoder(
        codec, chunk_frames=args.chunk, enable_bfloat16=args.bf16, n_streams=N
    )
    block = args.chunk * codec.hop_size * codec.ds_factor  # samples per chunk
    lat_e, codes_all = [], []
    pos = 0
    while pos < n:
        b = audio[:, pos : pos + block] if N > 1 else audio[0, pos : pos + block]
        pos += block
        t0 = time.perf_counter()
        c = _as_multi(enc.push(b))
        dt = time.perf_counter() - t0
        if c.shape[1]:
            lat_e.append(dt)
            codes_all.append(c)
    codes_all.append(_as_multi(enc.flush()))
    codes = np.concatenate(codes_all, axis=1)  # (N, T, GR)
    lat_e = np.asarray(lat_e[2:])  # drop compile/warm pushes
    if len(lat_e) < 3:
        raise SystemExit(
            f"only {len(lat_e)} steady-state encoder chunks after dropping "
            "2 warmups — increase --seconds or decrease --chunk"
        )
    chunk_audio_s = block / SR
    print(
        json.dumps(
            {
                "metric": "streaming encode chunk latency",
                "value": round(float(np.median(lat_e)) * 1e3, 1),
                "unit": "ms/chunk (median, host round trip incl.)",
                "p90_ms": round(float(np.quantile(lat_e, 0.9)) * 1e3, 1),
                "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
                "rtf": round(
                    N * chunk_audio_s / float(np.median(lat_e)), 2
                ),
                "streams": N,
                "chunks": int(len(lat_e)),
                "bf16": args.bf16,
            }
        ),
        flush=True,
    )

    # ---- decoder: feed the encoder's tokens back chunk by chunk
    dec = StreamingDecoder(
        codec, chunk_frames=args.chunk, halo_frames=args.halo,
        enable_bfloat16=args.bf16, n_streams=N,
    )
    lat_d = []
    pos = 0
    produced = 0
    n_frames = codes.shape[1]
    while pos < n_frames:
        c = (
            codes[:, pos : pos + args.chunk]
            if N > 1
            else codes[0, pos : pos + args.chunk]
        )
        pos += args.chunk
        t0 = time.perf_counter()
        w = _as_multi(dec.push(c))
        dt = time.perf_counter() - t0
        if w.shape[1]:
            lat_d.append(dt)
            produced += w.shape[1]
    # finish the sanity check the tail flush completes: every code frame
    # must come back out as hop*ds samples (per stream)
    produced += _as_multi(dec.flush()).shape[1]
    expected = n_frames * codec.hop_size * codec.ds_factor
    assert produced == expected, (produced, expected)
    lat_d = np.asarray(lat_d[2:])
    if len(lat_d) < 3:
        raise SystemExit(
            f"only {len(lat_d)} steady-state decoder chunks after dropping "
            "2 warmups — increase --seconds or decrease --chunk"
        )
    print(
        json.dumps(
            {
                "metric": "streaming decode chunk latency",
                "value": round(float(np.median(lat_d)) * 1e3, 1),
                "unit": "ms/chunk (median, host round trip incl.)",
                "p90_ms": round(float(np.quantile(lat_d, 0.9)) * 1e3, 1),
                "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
                "rtf": round(
                    N * chunk_audio_s / float(np.median(lat_d)), 2
                ),
                "streams": N,
                "chunks": int(len(lat_d)),
                "algorithmic_latency_ms": round(
                    dec.halo * codec.hop_size * codec.ds_factor / SR * 1e3, 1
                ),
                "bf16": args.bf16,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
