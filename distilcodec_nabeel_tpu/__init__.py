"""distilcodec_nabeel_tpu: a TPU-native (JAX/XLA/Pallas) audio codec framework
with the capabilities of DistilCodec (nabeelscicom/DistilCodec_nabeel).

Public surface mirrors the reference package export
(reference: distilcodec/__init__.py:1)."""

import os as _os

if _os.environ.get("DISTILCODEC_PLATFORM"):
    # Reliable platform pinning.  ``JAX_PLATFORMS=cpu`` is NOT honored under
    # the axon sitecustomize (its register call rewrites jax_platforms to
    # "axon,cpu" after env parsing); only a post-import config update wins.
    # Crucial on tunneled-TPU hosts where only ONE process may use the chip.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DISTILCODEC_PLATFORM"])

from .codec import (
    DistilCodec,
    DistilCodecModule,
    decode_audio,
    demo_for_generate_audio_codes,
)
from .config import (
    CodecConfig,
    TrainConfig,
    load_model_config,
    load_train_config,
)

__all__ = [
    "DistilCodec",
    "DistilCodecModule",
    "decode_audio",
    "demo_for_generate_audio_codes",
    "CodecConfig",
    "TrainConfig",
    "load_model_config",
    "load_train_config",
]

__version__ = "0.1.0"
