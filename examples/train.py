"""Train a DistilCodec model (the train.py the reference implies but never
shipped — SURVEY.md §1 "absent train loop").

Usage:
    python examples/train.py MODEL_CONFIG.json TRAIN_CONFIG.json \
        [--max-steps N] [--no-mesh]

Multi-host: run one process per host with the usual JAX cluster env
(coordinator address etc.) after calling ``parallel.mesh.setup()``; the file
list is sharded per host automatically and batches are GSPMD-sharded over
all devices.  SIGTERM/SIGINT checkpoint the current step before exiting
(preemption-safe).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distilcodec_nabeel_tpu.config import load_model_config, load_train_config
from distilcodec_nabeel_tpu.training.loop import run_training
from distilcodec_nabeel_tpu.utils.common import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_config")
    ap.add_argument("train_config")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-mesh", action="store_true",
                    help="single-device step (no GSPMD data sharding)")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    enable_compilation_cache()
    codec_cfg = load_model_config(args.model_config)
    train_cfg = load_train_config(args.train_config)
    run_training(
        codec_cfg,
        train_cfg,
        max_steps=args.max_steps,
        use_mesh=not args.no_mesh,
        log_dir=args.log_dir,
    )


if __name__ == "__main__":
    main()
