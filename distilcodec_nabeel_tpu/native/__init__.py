"""Native (C++) data-loader core, consumed via ctypes.

Replaces the per-item Python cost of the host data path — WAV decode,
polyphase resample, random crop, noise fallback — with a multithreaded C++
library (dc_io.cpp).  The reference does this work in Python with
librosa/soundfile inside DataLoader workers (distilcodec/models/
meldataset.py:18-20, :227-268); here the whole batch is produced by one
C call writing directly into a preallocated numpy array.

Everything degrades gracefully: if no C++ toolchain is present,
``available()`` is False and callers use the scipy path (utils/audio_io.py),
which the native decode/resample is numerics-tested against
(tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_tried = False


def _load():
    global _lib, _tried
    with _lib_lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("DISTILCODEC_NO_NATIVE"):
            return None
        from .build import build

        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.dc_load_wav.restype = ctypes.c_long
        lib.dc_load_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dc_free.restype = None
        lib.dc_free.argtypes = [ctypes.c_void_p]
        lib.dc_batch_crops.restype = ctypes.c_int
        lib.dc_batch_crops.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dc_save_wav.restype = ctypes.c_int
        lib.dc_save_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.dc_has_ffmpeg.restype = ctypes.c_int
        lib.dc_has_ffmpeg.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library compiled and loaded on this host."""
    return _load() is not None


def has_ffmpeg() -> bool:
    """True when the native library can decode non-WAV audio (mp3/flac/ogg)
    through the host's ffmpeg libav shared libraries."""
    lib = _load()
    return bool(lib and lib.dc_has_ffmpeg())


def load_wav(path: str, sr: int | None = None) -> tuple[np.ndarray, int]:
    """Native twin of utils.audio_io.load_wav: mono float32 in [-1, 1),
    resampled to ``sr`` when given.  Raises OSError on undecodable input
    (callers implement their own fallback policy)."""
    lib = _load()
    if lib is None:
        raise OSError("native loader unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    sr_out = ctypes.c_int(0)
    n = lib.dc_load_wav(
        path.encode(), int(sr or 0), ctypes.byref(out), ctypes.byref(sr_out)
    )
    if n < 0:
        raise OSError(f"native wav decode failed: {path}")
    try:
        audio = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.dc_free(out)
    return audio, int(sr) if sr else sr_out.value


def batch_crops(
    paths: list[str],
    segment: int,
    sr: int,
    seed: int,
    n_threads: int = 0,
    out: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Decode+resample+random-crop a whole batch in C++ threads.

    Returns ((len(paths), segment) float32, n_decoded).  Short clips are
    zero-padded; undecodable files become low-amplitude noise (the
    reference's resilience semantics, meldataset.py:243-246).  Crop starts
    are deterministic in (seed, index)."""
    lib = _load()
    if lib is None:
        raise OSError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, segment), dtype=np.float32)
    else:
        assert out.shape == (n, segment) and out.dtype == np.float32
        assert out.flags.c_contiguous
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.dc_batch_crops(
        arr,
        n,
        segment,
        sr,
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, ok


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Native 16-bit PCM writer (utils.audio_io.save_wav twin)."""
    lib = _load()
    if lib is None:
        raise OSError("native loader unavailable")
    audio = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
    rc = lib.dc_save_wav(
        path.encode(),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size,
        sample_rate,
    )
    if rc != 0:
        raise OSError(f"native wav write failed: {path}")
