"""Reduced-halo streaming decode: boundary-error vs latency table.

The exact StreamingDecoder uses the decoder's full receptive-field halo
(~24 code frames = 256 ms of algorithmic lookahead latency) and is
bit-identical to full-sequence decode (tests/test_streaming.py).  For
interactive serving, ``StreamingDecoder(halo_frames=H)`` trades exactness
for latency: each emitted chunk sees only H frames of future context, so
samples near chunk boundaries diverge from the full-sequence decode by the
truncated receptive-field tail.  The reference has no streaming at all
(SURVEY §5.7) — this quantifies the TPU framework's low-latency mode.

Method: decode a random token stream with the full-sequence path (ground
truth), then with StreamingDecoder at several halos, and report per-halo
max / RMS error and SNR over the whole stream plus the latency each halo
implies.  Runs on CPU (error is numerics, not hardware) with fp32 compute;
random-init weights (the published checkpoint is unreachable offline —
errors with trained weights will differ in magnitude, not in structure).

Usage: env DISTILCODEC_PLATFORM=cpu python bench_halo_error.py
       [--seconds 4] [--chunk 32] [--halos 24,16,8,4,2]
Prints one JSON line per halo; paste into DESIGN.md "Streaming".
"""

from __future__ import annotations

import argparse
import json

import numpy as np

SR = 24000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--halos", default="24,16,8,4,2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--ckpt",
        default=None,
        help="reference-format g_* checkpoint: measure with TRAINED weights "
        "(default random init)",
    )
    args = ap.parse_args()

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.streaming import StreamingDecoder
    from distilcodec_nabeel_tpu.utils.common import load_json

    cfg_path = "/root/reference/configs/model_config.json"
    if args.ckpt:
        codec = DistilCodec.from_pretrained(cfg_path, args.ckpt)
    else:
        codec = DistilCodec(load_json(cfg_path))
    K = codec.codec_config.quantizer.codebook_size
    hop = codec.hop_size * codec.ds_factor
    n_frames = int(args.seconds * SR / hop)
    rng = np.random.default_rng(args.seed)
    tokens = rng.integers(0, K, size=(n_frames,), dtype=np.int64)

    # ground truth: full-sequence decode
    ref = np.asarray(
        codec.decode_from_codes(tokens.tolist(), minus_token_offset=False)
    ).reshape(-1)

    for h in [int(s) for s in args.halos.split(",")]:
        dec = StreamingDecoder(codec, chunk_frames=args.chunk, halo_frames=h)
        outs = []
        for i in range(0, n_frames, args.chunk):
            outs.append(dec.push(tokens[i : i + args.chunk].tolist()))
        outs.append(dec.flush())
        got = np.concatenate(outs)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        err = got - ref
        rms_ref = float(np.sqrt(np.mean(ref**2)))
        rms_err = float(np.sqrt(np.mean(err**2)))
        snr = (
            float("inf")
            if rms_err == 0
            else 20 * np.log10(rms_ref / max(rms_err, 1e-30))
        )
        print(
            json.dumps(
                {
                    "halo_frames": h,
                    "latency_ms": round(h * hop / SR * 1e3, 1),
                    "max_abs_err": float(np.max(np.abs(err))),
                    "rms_err": rms_err,
                    "snr_db": round(snr, 1),
                    "exact": bool(np.array_equal(got, ref)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
