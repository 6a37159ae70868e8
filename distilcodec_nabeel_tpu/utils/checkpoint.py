"""Checkpoint management: orbax-native sharded checkpoints for training state
plus reference-compatible torch ``g_*`` pickle import/export.

The reference keeps single-file torch pickles with keep-last-N pruning and a
newest-checkpoint scanner (distil_codec.py:488-516, train_config.json:58
num_ckpt_keep=30); we reproduce that surface and add resumable full-train-state
checkpoints (optimizer + EMA codebook + spectral-norm state) via orbax.
"""

from __future__ import annotations

import glob
import os
import re

import jax
import numpy as np


def save_train_state(ckpt_dir: str, step: int, state, num_ckpt_keep: int = 30):
    """Orbax save of the full CodecTrainState at ``{dir}/state_{step:08d}``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"state_{step:08d}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, "state_", num_ckpt_keep)
    return path


def restore_train_state(ckpt_dir: str, abstract_state, step: int = -1):
    """Restore the newest (or exact-step) orbax train state."""
    import orbax.checkpoint as ocp

    path = scan_checkpoint(ckpt_dir, "state_", step)
    if path is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


def scan_checkpoint(cp_dir: str, prefix: str, target_steps: int = -1):
    """(distil_codec.py:504-516)."""
    pattern = os.path.join(cp_dir, prefix + "????????")
    cp_list = glob.glob(pattern)
    if len(cp_list) == 0:
        return None
    if target_steps != -1:
        for p in cp_list:
            if p.endswith(str(target_steps)):
                return p
    return sorted(cp_list)[-1]


def _prune(ckpt_dir: str, prefix: str, keep: int):
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, prefix + "*")))
    for c in ckpts[:-keep]:
        if os.path.isdir(c):
            import shutil

            shutil.rmtree(c, ignore_errors=True)
        else:
            os.remove(c)


def save_reference_checkpoint(
    ckpt_dir: str, step: int, variables: dict, cfg, num_ckpt_keep: int = 30
):
    """Write the torch-compatible ``g_{step:08d}`` pickle next to the orbax
    state so reference-side tooling can load our models."""
    from .torch_export import export_codec_checkpoint

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"g_{step:08d}")
    export_codec_checkpoint(variables, cfg, path)
    _prune(ckpt_dir, "g_", num_ckpt_keep)
    return path


def build_env(config_path: str, config_name: str, path: str):
    """Copy the config next to checkpoints for reproducibility
    (reference: distilcodec/utils/env.py:11-15)."""
    import shutil

    t_path = os.path.join(path, config_name)
    if config_path != t_path:
        os.makedirs(path, exist_ok=True)
        shutil.copyfile(config_path, t_path)
