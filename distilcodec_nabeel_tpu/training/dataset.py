"""Training data pipeline.

Behavioral twin of the reference dataset layer
(distilcodec/models/meldataset.py:49-301): recursive directory scans with an
optional process pool over third-level directories, replay-rate mixture
sampling of earlier training stages, interleaved validation lists capped at
500, random 3-second crops (segment_size=72000) with zero-padding of short
clips, low-amplitude-noise fallback for undecodable files, and an
n_cache_reuse wav cache.

TPU-first difference: items are raw audio crops; the log-mel transform runs
*inside* the jitted train step on device (it is two MXU matmuls there),
instead of per-item on dataloader CPUs.  A ``PrefetchLoader`` overlaps host
IO with device steps using a thread pool (num_workers, train_config.json:66).
"""

from __future__ import annotations

import os
import random
import time
from concurrent.futures import ThreadPoolExecutor
from itertools import zip_longest
from multiprocessing import Pool

import numpy as np

from ..utils.audio_io import load_wav


# --------------------------------------------------------------- file scans


def get_third_level_directories(directory: str) -> list[str]:
    out = []
    for l1 in os.scandir(directory):
        if not l1.is_dir():
            continue
        for l2 in os.scandir(l1.path):
            if not l2.is_dir():
                continue
            for l3 in os.scandir(l2.path):
                if l3.is_dir():
                    out.append(l3.path)
    return out


def get_files_in_directory(directory: str) -> list[str]:
    files = []
    for root, _, names in os.walk(directory):
        for name in names:
            files.append(os.path.join(root, name))
    return files


def get_all_files_mp(directory: str, nprocess: int = 4) -> list[str]:
    """4-process scan over third-level dirs (meldataset.py:49-74)."""
    third = get_third_level_directories(directory)
    with Pool(nprocess) as pool:
        results = pool.map(get_files_in_directory, third)
    all_files = []
    for root, _, names in os.walk(directory):
        depth = root[len(directory) :].count(os.sep)
        if depth < 3:
            for name in names:
                all_files.append(os.path.join(root, name))
    for lst in results:
        all_files.extend(lst)
    return all_files


def get_all_files_path(
    directory: str, desc: str = "", is_mp: bool = False, suffix: str = ".wav"
) -> list[str]:
    if desc:
        print(desc)
    start = time.time()
    if is_mp:
        files = get_all_files_mp(directory)
    else:
        files = []
        for root, _, names in os.walk(directory):
            for name in names:
                if name.endswith(suffix):
                    files.append(os.path.join(root, name))
    print(f"Scanning files of [{directory}] takes {time.time() - start:.2f}s")
    return files


def get_training_files(training_config: dict, suffix: str = ".wav") -> list[str]:
    """Replay-rate mixture of prior stages + current stage
    (meldataset.py:94-141, train_config.json:16-38)."""
    training_files: list[str] = []
    paths_cfg = training_config["training_files_path"]
    if isinstance(paths_cfg, dict):
        for i, ele in enumerate(paths_cfg.get("replay_training_file_pathes", [])):
            path_t, rate = ele["path"], ele["replay_rate"]
            files_t = get_all_files_path(
                path_t,
                desc=f"Scanning replay path: {path_t}, Replay-Rate: {rate}",
                suffix=suffix,
            )
            random.shuffle(files_t)
            sample_len = int(len(files_t) * rate)
            training_files.extend(files_t[:sample_len])
        current = paths_cfg.get("current_training_file_pathes", [])
        if isinstance(current, str):
            current = [current]
        for p in current:
            training_files.extend(
                get_all_files_path(p, desc=f"Scanning Training Data: {p}", suffix=suffix)
            )
    elif isinstance(paths_cfg, list):
        for p in paths_cfg:
            training_files.extend(
                get_all_files_path(p, desc=f"Scanning Training Data: {p}", suffix=suffix)
            )
    elif isinstance(paths_cfg, str):
        training_files.extend(
            get_all_files_path(
                paths_cfg, desc=f"Scanning Training Data: {paths_cfg}", suffix=suffix
            )
        )
    else:
        raise ValueError("Training pathes configuration error")
    random.shuffle(training_files)
    return training_files


def interleave_arrays(*arrays) -> list:
    out = []
    for elements in zip_longest(*arrays, fillvalue=None):
        out.extend(e for e in elements if e is not None)
    return out


def get_validation_files(
    training_config: dict,
    total_validation_number: int = 500,
    is_shuffle: bool = True,
    suffix: str = ".wav",
) -> list[str]:
    """(meldataset.py:154-177)."""
    valid_path = training_config["validation_files_path"]
    if isinstance(valid_path, list):
        lists = []
        for i, p in enumerate(valid_path):
            files_t = get_all_files_path(
                p, desc=f"Scanning validation file path: {p}", suffix=suffix
            )
            if i > 0 and is_shuffle:
                random.shuffle(files_t)
            lists.append(files_t)
        validation_files = interleave_arrays(*lists)
    elif isinstance(valid_path, str):
        validation_files = get_all_files_path(
            valid_path, desc=f"Scanning validation file path: {valid_path}", suffix=suffix
        )
    else:
        raise ValueError("Validation pathes configuration error")
    return validation_files[:total_validation_number]


def get_dataset_filelist(training_config: dict, suffix: str = ".wav"):
    training_files = get_training_files(training_config, suffix=suffix)
    print(f"Training files: {len(training_files)}")
    validation_files = get_validation_files(training_config, suffix=suffix)
    print(f"Validation files: {len(validation_files)}")
    return training_files, validation_files


def shard_files(
    files: list[str], host_id: int | None = None, n_hosts: int | None = None
) -> list[str]:
    """Deterministic per-host shard of a file list for multi-host training:
    each process loads a disjoint subset and GSPMD data-parallelism sees a
    globally-disjoint batch (the reference relies on DistributedSampler for
    this under DDP; here the split happens at the file list).  Round-robin
    over the given order so replay-mixture proportions survive sharding."""
    import jax

    if host_id is None:
        host_id = jax.process_index()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if n_hosts <= 1:
        return list(files)
    return files[host_id::n_hosts]


# ------------------------------------------------------------------ dataset


class AudioCropDataset:
    """Random-crop audio dataset (meldataset.py:190-301 minus the on-CPU mel,
    which lives in the jitted train step here)."""

    def __init__(
        self,
        training_files: list[str],
        segment_size: int,
        sampling_rate: int,
        split: bool = True,
        shuffle: bool = True,
        n_cache_reuse: int = 1,
        seed: int = 1234,
        fine_tuning: bool = False,
        base_mels_path: str | None = None,
        hop_size: int = 256,
    ):
        self.audio_files = list(training_files)
        self.seed = seed
        self._rng = random.Random(seed)
        self._epoch = 0
        if shuffle:
            self._rng.shuffle(self.audio_files)
        self.segment_size = segment_size
        self.sampling_rate = sampling_rate
        self.split = split
        self.n_cache_reuse = n_cache_reuse
        self._cached_wav = None
        self._cache_ref_count = 0
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        self.hop_size = hop_size

    def __len__(self):
        return len(self.audio_files)

    def set_epoch(self, epoch: int) -> None:
        """Crop offsets are a pure function of (seed, epoch, index) — the
        record-level determinism that makes mid-epoch resume exact (see
        PrefetchLoader.set_state)."""
        self._epoch = int(epoch)

    def _item_rng(self, index: int) -> random.Random:
        return random.Random(
            (self.seed * 1_000_003 + self._epoch) * 1_000_003 + index
        )

    def _load(self, filename: str) -> np.ndarray:
        if self._cache_ref_count == 0:
            try:
                audio, sr = load_wav(filename, sr=self.sampling_rate)
            except Exception:
                # corrupted-audio resilience: low-amplitude noise
                # (meldataset.py:243-246)
                print(f"Error on audio: {filename}")
                audio = (
                    np.random.normal(size=(self.sampling_rate,)) * 0.05
                ).astype(np.float32)
            self._cached_wav = audio
            self._cache_ref_count = self.n_cache_reuse
        else:
            audio = self._cached_wav
            self._cache_ref_count -= 1
        return audio

    def __getitem__(self, index: int):
        filename = self.audio_files[index]
        audio = self._load(filename)

        if not self.fine_tuning:
            if self.split:
                if audio.shape[-1] >= self.segment_size:
                    start = self._item_rng(index).randint(
                        0, audio.shape[-1] - self.segment_size
                    )
                    audio = audio[start : start + self.segment_size]
                else:
                    audio = np.pad(
                        audio, (0, self.segment_size - audio.shape[-1])
                    )
            return audio.astype(np.float32)

        # fine-tuning path: precomputed .npy mels aligned with the audio
        # (meldataset.py:271-294)
        import math

        mel = np.load(
            os.path.join(
                self.base_mels_path,
                os.path.splitext(os.path.split(filename)[-1])[0] + ".npy",
            )
        )
        if mel.ndim == 3:
            mel = mel[0]
        if self.split:
            frames_per_seg = math.ceil(self.segment_size / self.hop_size)
            if audio.shape[-1] >= self.segment_size:
                mel_start = self._item_rng(index).randint(
                    0, max(mel.shape[-1] - frames_per_seg - 1, 0)
                )
                mel = mel[:, mel_start : mel_start + frames_per_seg]
                audio = audio[
                    mel_start
                    * self.hop_size : (mel_start + frames_per_seg)
                    * self.hop_size
                ]
            else:
                mel = np.pad(mel, ((0, 0), (0, frames_per_seg - mel.shape[-1])))
                audio = np.pad(audio, (0, self.segment_size - audio.shape[-1]))
        return audio.astype(np.float32), mel.astype(np.float32)


class NativeCropLoader:
    """C++-backed batcher: one native call decodes, resamples, random-crops,
    and zero-pads the whole batch into a preallocated (B, segment) buffer in
    C++ threads (native/dc_io.cpp), with double-buffered prefetch.  Covers
    the standard training path (random crop, no fine-tune mels, no wav
    cache); :func:`make_loader` selects it automatically when the native
    library is available."""

    def __init__(
        self,
        files: list[str],
        batch_size: int,
        segment_size: int,
        sampling_rate: int,
        num_workers: int = 0,
        shuffle: bool = True,
        seed: int = 1234,
        drop_last: bool = True,
    ):
        self.files = list(files)
        self.batch_size = batch_size
        self.segment_size = segment_size
        self.sampling_rate = sampling_rate
        self.num_workers = num_workers  # 0 = hardware concurrency
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        self._next_batch = 0

    def __len__(self):
        n = len(self.files)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def state(self) -> dict:
        """Record-level position (see PrefetchLoader.state)."""
        return {"epoch": self._epoch, "batch": self._next_batch}

    def set_state(self, epoch: int, batch: int = 0) -> None:
        """Fast-forward to (epoch, batch) — exact: batch order is a pure
        function of (seed, epoch) and crop seeds of (seed, epoch, batch
        index), so skipping is index arithmetic, no data is read."""
        self._epoch = int(epoch)
        self._next_batch = int(batch)

    def __iter__(self):
        from .. import native

        order = list(range(len(self.files)))
        epoch = self._epoch
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(order)
        batches = [
            [self.files[j] for j in order[i : i + self.batch_size]]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def produce(i):
            out, _ = native.batch_crops(
                batches[i],
                self.segment_size,
                self.sampling_rate,
                # crop seed keyed to the ABSOLUTE batch index so resumed and
                # uninterrupted runs see identical data
                seed=(self.seed * 1_000_003 + epoch) * 1_000_003 + i,
                n_threads=self.num_workers,
            )
            return out

        start = self._next_batch
        with ThreadPoolExecutor(1) as pool:  # C++ releases the GIL per batch
            futures = []
            idx = start
            while idx < len(batches) or futures:
                while idx < len(batches) and len(futures) < 2:
                    futures.append(pool.submit(produce, idx))
                    idx += 1
                yield futures.pop(0).result()
                self._next_batch += 1
        self._epoch = epoch + 1
        self._next_batch = 0


def make_loader(
    files: list[str],
    batch_size: int,
    segment_size: int,
    sampling_rate: int,
    num_workers: int = 4,
    shuffle: bool = True,
    seed: int = 1234,
    drop_last: bool = True,
):
    """Pick the native C++ batch loader when available (and the files are
    formats it can decode), else the Python thread-pool loader."""
    from .. import native

    def _decodable(f: str) -> bool:
        if f.lower().endswith(".wav"):
            return True
        return native.has_ffmpeg()  # mp3/flac/ogg/... via libav

    if native.available() and all(_decodable(f) for f in files[:64]):
        return NativeCropLoader(
            files,
            batch_size,
            segment_size,
            sampling_rate,
            num_workers=0,
            shuffle=shuffle,
            seed=seed,
            drop_last=drop_last,
        )
    ds = AudioCropDataset(
        files, segment_size=segment_size, sampling_rate=sampling_rate, seed=seed
    )
    return PrefetchLoader(
        ds,
        batch_size=batch_size,
        num_workers=num_workers,
        shuffle=shuffle,
        seed=seed,
        drop_last=drop_last,
    )


class PrefetchLoader:
    """Thread-pooled batcher: yields (B, segment) float32 arrays, overlapping
    file IO with device compute (num_workers, train_config.json:66).

    Deterministic record-level resume (the grain/tf.data property SURVEY §7.7
    asks for): batch order is a pure function of (seed, epoch) and every crop
    offset of (seed, epoch, item index), so the stream position is fully
    described by two integers.  ``set_state(epoch, batch)`` fast-forwards by
    index arithmetic — no data is read or skipped-through — and the resumed
    stream is bit-identical to the uninterrupted one.  One train step
    consumes one batch, so the training loop resumes with
    ``set_state(*divmod(step, len(loader)))``."""

    def __init__(
        self,
        dataset: AudioCropDataset,
        batch_size: int,
        num_workers: int = 4,
        shuffle: bool = True,
        seed: int = 1234,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        self._next_batch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def state(self) -> dict:
        """Record-level position: the next batch to be yielded."""
        return {"epoch": self._epoch, "batch": self._next_batch}

    def set_state(self, epoch: int, batch: int = 0) -> None:
        """Fast-forward to (epoch, batch); see class docstring."""
        self._epoch = int(epoch)
        self._next_batch = int(batch)

    def __iter__(self):
        order = list(range(len(self.dataset)))
        epoch = self._epoch
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(order)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        with ThreadPoolExecutor(self.num_workers) as pool:
            batches = [
                order[i : i + self.batch_size]
                for i in range(0, len(order), self.batch_size)
            ]
            if self.drop_last:
                batches = [b for b in batches if len(b) == self.batch_size]
            # prefetch two batches ahead, starting from the resume cursor
            futures = []
            idx = self._next_batch

            def submit(batch_ids):
                return [pool.submit(self.dataset.__getitem__, i) for i in batch_ids]

            while idx < len(batches) or futures:
                while idx < len(batches) and len(futures) < 2:
                    futures.append(submit(batches[idx]))
                    idx += 1
                batch_futs = futures.pop(0)
                items = [f.result() for f in batch_futs]
                if isinstance(items[0], tuple):  # fine-tuning (audio, mel)
                    yield tuple(
                        np.stack([it[j] for it in items])
                        for j in range(len(items[0]))
                    )
                else:
                    yield np.stack(items)
                self._next_batch += 1
        self._epoch = epoch + 1
        self._next_batch = 0
