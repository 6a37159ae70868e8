"""Misc utilities mirroring the reference's utils surface
(distilcodec/utils/common_utils.py, file.py, models/utils.py)."""

from __future__ import annotations

import json
import os

import numpy as np

AUDIO_EXTENSIONS = {
    ".mp3", ".wav", ".flac", ".ogg", ".m4a", ".wma", ".aac", ".aiff",
    ".aif", ".aifc", ".opus",
}
VIDEO_EXTENSIONS = {".mp4", ".avi", ".mkv", ".mov", ".wmv", ".flv", ".webm"}


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(obj, path: str, indent: int = 4):
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def load_yaml(path: str):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def save_yaml(obj, path: str):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def list_files(
    path: str,
    extensions: set | None = None,
    recursive: bool = False,
    sort: bool = True,
) -> list[str]:
    """(reference: utils/file.py:40-76)."""
    out = []
    if recursive:
        for root, _, names in os.walk(path):
            for n in names:
                p = os.path.join(root, n)
                if extensions is None or os.path.splitext(n)[1].lower() in extensions:
                    out.append(p)
    else:
        for n in os.listdir(path):
            p = os.path.join(path, n)
            if os.path.isfile(p) and (
                extensions is None or os.path.splitext(n)[1].lower() in extensions
            ):
                out.append(p)
    return sorted(out) if sort else out


def make_dirs(path: str, exist_ok: bool = True):
    os.makedirs(path, exist_ok=exist_ok)


def split_list(lst: list, n: int) -> list[list]:
    """Split into n roughly-equal chunks (reference: file.py:90-101)."""
    k, m = divmod(len(lst), n)
    return [lst[i * k + min(i, m) : (i + 1) * k + min(i + 1, m)] for i in range(n)]


def sequence_mask(lengths: np.ndarray, max_length: int | None = None) -> np.ndarray:
    """(reference: models/utils.py:16-20)."""
    lengths = np.asarray(lengths)
    if max_length is None:
        max_length = int(lengths.max())
    return np.arange(max_length)[None, :] < lengths[:, None]


def plot_spectrogram(spectrogram, path: str | None = None):
    """Mel-spectrogram figure (reference: common_utils.py:48-57)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(
        np.asarray(spectrogram), aspect="auto", origin="lower", interpolation="none"
    )
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    if path is not None:
        fig.savefig(path)
        plt.close(fig)
    return fig


def embedding_analysis(embeddings, desp: str = "") -> dict:
    """(reference: distil_codec.py:294-300)."""
    e = np.asarray(embeddings, dtype=np.float32)
    stats = {
        "mean_abs": float(np.abs(e).mean()),
        "max": float(e.max()),
        "min": float(e.min()),
    }
    print(
        f"{desp} mean: {stats['mean_abs']}\n{desp} max: {stats['max']}\n"
        f"{desp} min: {stats['min']}"
    )
    return stats


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (XLA binaries cached across
    processes).  Full-model TPU compiles are minutes on this backend (the
    complete train step measured ~27 min remote-compile); the cache makes
    re-runs of the same program shapes near-instant.

    Called by bench.py, the training CLI, and the graft entry; safe to call
    more than once.  Returns the cache directory used.
    """
    import jax

    path = path or os.environ.get(
        "DISTILCODEC_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "distilcodec_xla"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax: flag names differ — degrade quietly
        print(f"compilation cache unavailable: {e}")
    return path
