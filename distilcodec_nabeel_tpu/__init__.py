"""distilcodec_nabeel_tpu: a TPU-native (JAX/XLA/Pallas) audio codec framework
with the capabilities of DistilCodec (nabeelscicom/DistilCodec_nabeel).

Public surface mirrors the reference package export
(reference: distilcodec/__init__.py:1)."""

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
