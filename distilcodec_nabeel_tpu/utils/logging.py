"""Metrics logging: TensorBoard + optional W&B with graceful degradation.

Behavioral twin of distilcodec/utils/wandb_utils.py:33-77 (rank-0-only nested
``{section}/{metric}`` logging, degrade-to-disabled when wandb is missing or
errors) plus jax.profiler trace helpers the reference lacked (SURVEY §5.1).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Mapping

import jax
import numpy as np


def is_primary() -> bool:
    return jax.process_index() == 0


def print_rank_0(*message):
    """(dist_utils.py:26-32)."""
    if is_primary():
        print(*message, flush=True)


class MetricsLogger:
    """TensorBoard writer + optional wandb, rank-0 gated."""

    def __init__(self, log_dir: str, use_wandb: bool = False, wandb_cfg: Mapping | None = None):
        self._tb = None
        self._wandb = None
        if not is_primary():
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                cfg = dict(wandb_cfg or {})
                wandb.init(
                    project=cfg.get("wandb_project"),
                    group=cfg.get("wandb_group"),
                    entity=cfg.get("wandb_team"),
                )
                self._wandb = wandb
            except Exception as e:  # UsageError / missing package
                print(f"wandb disabled: {e}")
                self._wandb = None

    def log(self, metrics: Mapping[str, Any], step: int):
        if not is_primary():
            return
        scalars = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self):
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler annotation for timeline traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    jax.profiler.stop_trace()


class StepTimer:
    """block_until_ready timing harness for steady-state step measurement."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_ref: list | None = None):
        import time

        start = time.perf_counter()
        yield
        if result_ref:
            jax.block_until_ready(result_ref)
        self.times.append(time.perf_counter() - start)

    def summary(self, skip_warmup: int = 1) -> dict:
        ts = self.times[skip_warmup:] or self.times
        return {
            "mean_s": float(np.mean(ts)),
            "p50_s": float(np.median(ts)),
            "min_s": float(np.min(ts)),
            "n": len(ts),
        }
