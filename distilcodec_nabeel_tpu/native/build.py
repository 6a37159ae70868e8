"""Build the native data-loader core (dc_io.cpp) into a shared library.

Compiled lazily on first use and cached next to the source, keyed by a hash
of the source + compile flags, so editing the .cpp transparently rebuilds.
No pybind11 in this image — the library exposes a plain C ABI consumed via
ctypes (native/__init__.py).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "dc_io.cpp")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-march=native"]


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read() + " ".join(_FLAGS).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DISTILCODEC_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "distilcodec_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"dc_io_{digest}.so")


def build(verbose: bool = False) -> str | None:
    """Compile (or reuse cached) libdc_io; returns the .so path, or None when
    no C++ toolchain is available (callers fall back to the scipy path)."""
    out = _cache_path()
    if os.path.exists(out):
        return out
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return None
    tmp = out + f".tmp{os.getpid()}"
    cmd = [cxx, *_FLAGS, _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if verbose:
            print(proc.stderr)
        return None
    os.replace(tmp, out)  # atomic: concurrent builders race benignly
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    print(path if path else "BUILD FAILED")
