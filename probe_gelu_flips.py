"""Token-flip bound for the approximate-GELU serving recipe.

DISTILCODEC_GELU_APPROX=1 swaps the encoder ConvNeXt blocks' exact-erf GELU
for the tanh approximation (models/blocks.py).  The approximation perturbs
the encoder output by ~1e-3 relative, which can flip near-tie VQ argmins —
this probe measures how many token ids actually flip on real audio at full
scale (the resampler-sensitivity methodology, test_resampler_parity.py).

Usage: python probe_gelu_flips.py [--ckpt g_XXXXXXXX] [paths...]
(default audio: the in-repo demo wav; default weights: random init — pass
--ckpt to re-measure with TRAINED weights, e.g. the r5 overfit export, as
r4 VERDICT weak 3 requires before any default change)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def encode(approx: bool, wavs, ckpt: str | None):
    # a fresh DistilCodec per setting: the env is read at trace time, and a
    # new module instance forces a fresh trace
    os.environ["DISTILCODEC_GELU_APPROX"] = "1" if approx else "0"
    from distilcodec_nabeel_tpu import DistilCodec
    from distilcodec_nabeel_tpu.utils.common import load_json

    cfg_path = "/root/reference/configs/model_config.json"
    if ckpt:
        codec = DistilCodec.from_pretrained(cfg_path, ckpt)
    else:
        codec = DistilCodec(load_json(cfg_path))
    out = []
    for w in wavs:
        _, codes_list, *_ = codec.encode(
            [[w, 24000]], enable_bfloat16=True, raw_audio=True
        )
        out.append(
            np.asarray([t["in_codebook_id"] for t in codes_list[0]])
        )
    return out


def main():
    from scipy.io import wavfile

    from distilcodec_nabeel_tpu.utils.audio_io import resample

    argv = sys.argv[1:]
    ckpt = None
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        ckpt = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    paths = argv or ["/root/reference/data/org_audios/0006.wav"]
    wavs = []
    for p in paths:
        sr, data = wavfile.read(p)
        data = data.astype(np.float32) / 32768.0
        if data.ndim > 1:
            data = data.mean(axis=1)
        if sr != 24000:
            data = resample(data, sr, 24000)
        wavs.append(data)

    exact = encode(False, wavs, ckpt)
    approx = encode(True, wavs, ckpt)
    total = flips = 0
    for e, a in zip(exact, approx):
        assert e.shape == a.shape
        total += e.size
        flips += int((e != a).sum())
    print(
        json.dumps(
            {
                "metric": "gelu_approx token flips",
                "flips": flips,
                "total_tokens": total,
                "flip_rate": flips / total,
                "files": len(paths),
                "weights": ckpt or "random-init",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
