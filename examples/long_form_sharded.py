"""Demo: long-form single-stream audio, time-sharded across a device mesh with
halo exchange (BASELINE config 5).

On a multi-chip slice this runs one chunk per chip with ppermute halo
exchange over ICI; on a single host you can simulate with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from distilcodec_nabeel_tpu import DistilCodec, load_model_config
from distilcodec_nabeel_tpu.parallel.halo import TimeShardedCodec
from distilcodec_nabeel_tpu.parallel.mesh import time_mesh
from distilcodec_nabeel_tpu.utils.audio_io import load_wav


def main(argv):
    config_path = argv[0] if argv else "/root/reference/configs/model_config.json"
    codec = DistilCodec(load_model_config(config_path))
    mesh = time_mesh()
    sharded = TimeShardedCodec(codec.module, codec.variables, mesh)

    if len(argv) > 1:
        audio, _ = load_wav(argv[1], sr=24000)
    else:
        audio = (np.random.default_rng(0).standard_normal(24000 * 24) * 0.1).astype(
            np.float32
        )  # 24 seconds

    codes = sharded.encode_codes(audio)
    n_valid = audio.shape[-1] // codec.hop_size
    print(f"{audio.shape[-1] / 24000:.1f}s -> {n_valid} codes over "
          f"{mesh.devices.size} devices")

    wave = sharded.decode_codes(codes[:n_valid, 0])
    print(f"decoded {wave.shape[-1] / 24000:.1f}s of audio")


if __name__ == "__main__":
    main(sys.argv[1:])
