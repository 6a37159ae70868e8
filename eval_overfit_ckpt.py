"""Evaluate a trained (overfit-exported) g_* checkpoint on org wavs vs the
random-init baseline — the full `evaluate_codec` metric set (SI-SNR, STOI,
pesq_like, multi-res mel-L1, corpus codebook usage/perplexity), with
`pad_to_multiple` bucketing so N distinct file lengths compile a handful of
programs instead of N (the r5 serving knob, exercised on the production
path).

Usage: python eval_overfit_ckpt.py CKPT_G_FILE [--files 10] [--random-init]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default=None)
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument(
        "--pad-to-multiple",
        type=int,
        default=24000,
        help="serving bucket (samples); 0 disables",
    )
    args = ap.parse_args()

    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.evaluation import evaluate_codec
    from distilcodec_nabeel_tpu.utils.common import (
        enable_compilation_cache,
        load_json,
    )

    enable_compilation_cache()
    cfg_path = "/root/reference/configs/model_config.json"
    if args.random_init or not args.ckpt:
        codec = DistilCodec(load_json(cfg_path))
        weights = "random-init"
    else:
        codec = DistilCodec.from_pretrained(cfg_path, args.ckpt)
        weights = args.ckpt
    if args.pad_to_multiple:
        codec.pad_to_multiple = args.pad_to_multiple

    files = sorted(glob.glob("/root/reference/data/org_audios/*.wav"))[: args.files]
    t0 = time.perf_counter()
    out = evaluate_codec(codec, files)
    out["weights"] = weights
    out["pad_to_multiple"] = args.pad_to_multiple
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
