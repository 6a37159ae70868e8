"""Unified CLI: ``python -m distilcodec_nabeel_tpu <command>``.

The reference ships no CLI (SURVEY §1); this wraps the facade so every
workflow is reachable from a shell:

    encode  CONFIG CKPT AUDIO...        audio file(s) -> token ids (JSON)
    decode  CONFIG CKPT TOKENS_JSON OUT token ids -> waveform .wav
    eval    CONFIG CKPT AUDIO...        round-trip quality + codebook metrics
    train   MODEL_CONFIG TRAIN_CONFIG   GAN training (examples/train.py twin)

``CKPT`` is a reference-format ``g_*`` torch checkpoint (or a directory to
scan for the newest); pass ``--random-init`` instead to exercise flows
without weights.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_codec(config: str, ckpt: str | None, random_init: bool):
    from . import DistilCodec, load_model_config

    if random_init or ckpt is None:
        return DistilCodec(load_model_config(config))
    import os

    if os.path.isdir(ckpt):
        from .utils.checkpoint import scan_checkpoint

        found = scan_checkpoint(ckpt, "g_")
        if not found:
            raise SystemExit(f"no g_* checkpoint under {ckpt}")
        ckpt = found
    return DistilCodec.from_pretrained(config, ckpt)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="distilcodec_nabeel_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_model_args(p):
        p.add_argument("config")
        p.add_argument("ckpt", nargs="?", default=None)
        p.add_argument("--random-init", action="store_true")

    pe = sub.add_parser("encode", help="audio file(s) -> token ids (JSON)")
    add_model_args(pe)
    pe.add_argument("audio", nargs="+")
    pe.add_argument("--no-offset", action="store_true",
                    help="emit raw in-codebook ids (no LLM vocab offset)")

    pd = sub.add_parser("decode", help="token ids (JSON file or '-') -> .wav")
    add_model_args(pd)
    pd.add_argument("tokens", help="JSON list of ids, path or '-' for stdin")
    pd.add_argument("out", help="output .wav path")
    pd.add_argument("--no-offset", action="store_true",
                    help="ids are raw in-codebook ids (skip offset subtract)")

    pv = sub.add_parser("eval", help="round-trip quality + codebook metrics")
    add_model_args(pv)
    pv.add_argument("audio", nargs="+")
    pv.add_argument("--max-files", type=int, default=None)

    pt = sub.add_parser("train", help="run GAN training")
    pt.add_argument("model_config")
    pt.add_argument("train_config")
    pt.add_argument("--max-steps", type=int, default=None)
    pt.add_argument("--no-mesh", action="store_true")

    pg = sub.add_parser(
        "gate",
        help="real-checkpoint parity + quality gate (see parity_gate.py)",
    )
    pg.add_argument("config")
    pg.add_argument("ckpt", nargs="?", default=None)
    pg.add_argument("--random-init", action="store_true",
                    help="dry run: random-weight checkpoint through the "
                         "identical machinery")
    pg.add_argument("--audio-dir",
                    default="/root/reference/data/org_audios",
                    help="evaluation audio set (LibriSpeech-test-clean for "
                         "the published-baseline comparison)")
    pg.add_argument("--ref-pairs", nargs=2, metavar=("ORG_DIR", "GEN_DIR"),
                    default=None,
                    help="gate quality against the reference's own "
                         "reconstructions of the same originals")
    pg.add_argument("--max-files", type=int, default=None)
    pg.add_argument("--parity-files", type=int, default=8)
    pg.add_argument("--min-agreement", type=float, default=0.999)

    args = ap.parse_args(argv)

    from .utils.common import enable_compilation_cache

    enable_compilation_cache()

    if args.cmd == "gate":
        from .parity_gate import run_gate

        report = run_gate(
            args.config,
            args.ckpt,
            args.audio_dir,
            ref_pairs=tuple(args.ref_pairs) if args.ref_pairs else None,
            max_files=args.max_files,
            parity_files=args.parity_files,
            min_agreement=args.min_agreement,
            random_init=args.random_init,
        )
        json.dump(report, sys.stdout, indent=2, default=float)
        print()
        raise SystemExit(0 if report["pass"] or report["dry_run"] else 1)

    if args.cmd == "train":
        from .config import load_model_config, load_train_config
        from .training.loop import run_training

        run_training(
            load_model_config(args.model_config),
            load_train_config(args.train_config),
            max_steps=args.max_steps,
            use_mesh=not args.no_mesh,
        )
        return

    codec = _load_codec(args.config, args.ckpt, args.random_init)

    if args.cmd == "encode":
        from . import demo_for_generate_audio_codes

        out = {}
        for path in args.audio:
            out[path] = demo_for_generate_audio_codes(
                codec, path, plus_llm_offset=not args.no_offset
            )
        json.dump(out, sys.stdout)
        print()
    elif args.cmd == "decode":
        from .utils.audio_io import save_wav

        raw = (
            sys.stdin.read()
            if args.tokens == "-"
            else open(args.tokens).read()
        )
        ids = json.loads(raw)
        if isinstance(ids, dict):  # output of `encode`: take the first entry
            ids = next(iter(ids.values()))
        wave = codec.decode_from_codes(
            ids, minus_token_offset=not args.no_offset
        )
        save_wav(args.out, wave[0, 0], codec.spec_config.sampling_rate)
        print(f"{args.out}: {wave.shape[-1]} samples", file=sys.stderr)
    elif args.cmd == "eval":
        from .evaluation import evaluate_codec

        metrics = evaluate_codec(codec, args.audio, max_files=args.max_files)
        json.dump(metrics, sys.stdout, indent=2, default=float)
        print()


if __name__ == "__main__":
    main()
