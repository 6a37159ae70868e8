from .mel import LogMelSpectrogram, compress, decompress, melscale_fbanks
from .stft import (
    frame_signal,
    hann_window,
    reflect_pad_for_stft,
    stft_complex,
    stft_magnitude,
)

__all__ = [
    "LogMelSpectrogram",
    "compress",
    "decompress",
    "melscale_fbanks",
    "frame_signal",
    "hann_window",
    "reflect_pad_for_stft",
    "stft_complex",
    "stft_magnitude",
]
