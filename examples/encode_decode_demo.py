"""Demo: audio -> LLM token ids -> audio (the reference README Part 1/2 flows).

Usage:
    python examples/encode_decode_demo.py <model_config.json> <g_checkpoint> \
        [audio.wav ...]

Without a checkpoint, pass ``--random-init`` to run the flow with random
weights (useful to validate the pipeline without the published g_00204000).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from distilcodec_nabeel_tpu import (
    DistilCodec,
    demo_for_generate_audio_codes,
    load_model_config,
)


def main(argv):
    if "--random-init" in argv:
        argv.remove("--random-init")
        config_path = argv[0]
        codec = DistilCodec(load_model_config(config_path))
        audio_paths = argv[1:]
    else:
        config_path, model_path = argv[0], argv[1]
        codec = DistilCodec.from_pretrained(
            config_path, model_path, use_generator=True
        )
        audio_paths = argv[2:]

    if not audio_paths:
        audio_paths = ["/root/reference/data/org_audios/0000.wav"]

    for path in audio_paths:
        # Part 1: audio -> audio tokens (with the Qwen vocab offset)
        tokens = demo_for_generate_audio_codes(codec, path, target_sr=24000)
        print(f"{path}: {len(tokens)} tokens "
              f"({len(tokens) / (len(tokens) / 93.75):.2f} TPS nominal), "
              f"first 8: {tokens[:8]}")

        # Part 2: tokens -> waveform
        wave = codec.decode_from_codes(
            tokens, minus_token_offset=True, enable_bfloat16=True
        )
        out = codec.save_wav(
            wave,
            [wave.shape[-1]],
            save_path="./generated",
            name_tag=path.split("/")[-1].replace(".wav", "_recon"),
        )
        print(f"  -> {out[0]}")


if __name__ == "__main__":
    main(sys.argv[1:])
