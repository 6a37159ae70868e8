"""Mesh construction + multi-host initialization.

Replaces the reference's NCCL/torchrun plumbing (distilcodec/utils/
dist_utils.py:11-85) with JAX's: ``jax.distributed.initialize`` from the same
MASTER_ADDR/PORT + WORLD_SIZE/RANK env vars (or SLURM autodetection), then
device meshes over (data, time, model) axes.  Collectives ride ICI within a
slice and DCN across slices via GSPMD — no explicit backend management.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def setup(coordinator_address: str | None = None) -> None:
    """Multi-host init (reference ``setup``, dist_utils.py:11-18).

    Reads MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK if not given explicitly;
    under SLURM/TPU pods jax.distributed autodetects everything.
    """
    kwargs = {}
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        coordinator_address = (
            f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
        )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
        if os.environ.get("WORLD_SIZE"):
            kwargs["num_processes"] = int(os.environ["WORLD_SIZE"])
        if os.environ.get("RANK"):
            kwargs["process_id"] = int(os.environ["RANK"])
    # CPU multi-process clusters (tests / dev boxes) need an explicit
    # cross-process collectives backend — XLA:CPU's default is none and every
    # psum would hang.  TPU/GPU ignore this flag.  Must be set before
    # initialize(); executed-coverage: tests/test_multiprocess.py.
    if (
        os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
        or os.environ.get("DISTILCODEC_PLATFORM") == "cpu"
    ):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax without the option: single-process only
    jax.distributed.initialize(**kwargs)
    print(
        f"[{os.getpid()}] jax.distributed initialized: "
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def cleanup() -> None:
    """(reference ``cleanup``, dist_utils.py:35-38)."""
    jax.distributed.shutdown()


def local_rank() -> int:
    """(reference ``local_rank``, dist_utils.py:71-85)."""
    lr = os.environ.get("LOCAL_RANK") or os.environ.get("SLURM_LOCALID")
    if lr is None:
        return jax.process_index()
    return int(lr)


def get_rank() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def make_mesh(
    data: int | None = None, time: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Mesh over (data, time, model).  ``data=None`` absorbs all remaining
    devices.  Axis sizes of 1 are kept so PartitionSpecs stay uniform."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if data is None:
        assert total % (time * model) == 0
        data = total // (time * model)
    assert data * time * model == total, (data, time, model, total)
    return Mesh(devices.reshape(data, time, model), ("data", "time", "model"))


def data_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("data",))


def time_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("time",))
