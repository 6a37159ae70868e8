"""End-to-end training driver (the train.py the reference never shipped).

Wires dataset -> jitted GAN step -> checkpoints/metrics with the
train_config.json schedule: checkpoint_interval 1000, validation_interval
2000, summary_interval 10, keep-last-30 (train_config.json:53-58), distill
init from a teacher checkpoint (``distill.is_distill``, :46-51).

Run: ``python -m distilcodec_nabeel_tpu.training.loop <model_config.json>
<train_config.json>``.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, TrainConfig, load_model_config, load_train_config
from ..utils import checkpoint as ckpt_utils
from ..utils.logging import MetricsLogger, StepTimer, print_rank_0
from .dataset import get_dataset_filelist, make_loader, shard_files
from .train import CodecTrainState, Trainer


class GracefulShutdown:
    """Preemption-safe stop: SIGTERM/SIGINT set a flag the training loop
    polls each step, so the final state is checkpointed and the loop returns
    cleanly instead of dying mid-step.  (TPU pods surface maintenance events
    and autoscaler evictions as SIGTERM; the reference has no handling —
    SURVEY §5.3 — resume relies purely on the last periodic checkpoint.)"""

    def __init__(self):
        self.requested = False
        self._prev = {}

    def __enter__(self):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self  # signal handlers only work in the main thread
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main interpreter contexts
                pass
        return self

    def _handler(self, signum, frame):
        print_rank_0(f"signal {signum}: finishing step, then checkpointing")
        self.requested = True

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        return False


def make_data_mesh():
    """All visible devices on one ``data`` axis (multi-host ready: under
    jax.distributed.initialize, jax.devices() spans hosts)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    return Mesh(devs, ("data",))


def run_validation(
    trainer: Trainer,
    state: CodecTrainState,
    validation_files: list[str],
    *,
    batch_size: int | None = None,
    num_workers: int = 4,
    eval_fn=None,
    seed: int = 1234,
) -> dict:
    """Production-scale validation: stream the full interleaved validation
    list (the reference design caps it at 500 files, meldataset.py:144-177)
    through the jitted eval_step — multi-res mel L1 (x1, x2, x0.5, x0.25) +
    codebook usage/perplexity — in fixed-shape batches.

    No recompiles and no OOM by construction: every file contributes one
    deterministic seeded segment-size crop (shorter files zero-pad), the
    final partial batch wraps around to the list head so every program shape
    is exactly (batch, segment), and batches stream through the prefetching
    loader — only one batch is ever resident on host or device.  The
    wrap-around duplicates bias the means by < batch/num_files (documented
    trade for a single compiled shape).  Returns mean metrics over batches.
    """
    cfg = trainer.codec_cfg
    batch_size = batch_size or trainer.train_cfg.batch_size
    files = list(validation_files)
    if not files:
        return {}
    eval_fn = eval_fn or jax.jit(trainer.eval_step)
    padded = list(files)
    while len(padded) % batch_size:
        padded.append(files[len(padded) % len(files)])
    loader = make_loader(
        padded,
        batch_size=batch_size,
        segment_size=cfg.spec.segment_size,
        sampling_rate=cfg.spec.sampling_rate,
        num_workers=num_workers,
        shuffle=False,
        seed=seed,
        drop_last=True,
    )
    sums: dict = {}
    n_batches = 0
    for vb in loader:
        m = eval_fn(state, jnp.asarray(vb))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n_batches += 1
    out = {k: v / max(n_batches, 1) for k, v in sums.items()}
    out["val/num_files"] = float(len(files))
    return out


def distill_init(
    state: CodecTrainState,
    trainer: Trainer,
    codec_cfg: CodecConfig,
    distill: dict,
) -> CodecTrainState:
    """DMS step 3 (reference README.md:44-53): the student inherits the
    TEACHER's encoder/decoder parameters from a reference-format ``g_*``
    checkpoint; the quantizer + codebook stay at the student's fresh init
    unless ``quantizer_transfer`` is set (the shipped train_config.json:46-51
    uses ``quantizer_transfer: false`` — the whole point of DMS is a fresh
    single large codebook under an already-trained encoder/decoder).

    The generator optimizer state is re-initialized for the inherited
    params.  Returns ``state`` unchanged when the distill config is off or
    the teacher checkpoint directory has no ``g_*`` file.
    """
    if not (distill.get("is_distill") and distill.get("teacher_ckpt_path")):
        return state
    teacher_path = ckpt_utils.scan_checkpoint(distill["teacher_ckpt_path"], "g_")
    if not teacher_path:
        return state
    from ..utils.torch_import import (
        convert_codec_checkpoint,
        load_torch_checkpoint,
    )

    print_rank_0(f"Distill init from teacher: {teacher_path}")
    transfer_q = bool(distill.get("quantizer_transfer"))
    # quantizer conversion only when transferring: the teacher's quantizer
    # architecture generally differs from the student's (DMS table,
    # README.md:56-59) and must not be converted against the student cfg
    teacher_vars = convert_codec_checkpoint(
        load_torch_checkpoint(teacher_path),
        codec_cfg,
        include_quantizer=transfer_q,
    )
    gen_params = dict(state.gen_params)
    for k in ("encoder", "generator"):
        if k in teacher_vars["params"]:
            gen_params[k] = jax.tree_util.tree_map(
                jnp.asarray, teacher_vars["params"][k]
            )
    if transfer_q:
        gen_params["quantizer"] = jax.tree_util.tree_map(
            jnp.asarray, teacher_vars["params"]["quantizer"]
        )
        state = state.replace(
            codebook=jax.tree_util.tree_map(jnp.asarray, teacher_vars["codebook"])
        )
    return state.replace(
        gen_params=gen_params,
        gen_opt_state=trainer.gen_tx.init(gen_params),
    )


def run_training(
    codec_cfg: CodecConfig,
    train_cfg: TrainConfig,
    *,
    training_files: list[str] | None = None,
    validation_files: list[str] | None = None,
    max_steps: int | None = None,
    use_mesh: bool = True,
    log_dir: str | None = None,
):
    if training_files is None or validation_files is None:
        training_files, validation_files = get_dataset_filelist(
            {
                "training_files_path": train_cfg.training_files_path,
                "validation_files_path": train_cfg.validation_files_path,
            }
        )

    # multi-host: each process reads a disjoint shard of the file list
    training_files = shard_files(training_files)
    loader = make_loader(
        training_files,
        batch_size=train_cfg.batch_size,
        segment_size=codec_cfg.spec.segment_size,
        sampling_rate=codec_cfg.spec.sampling_rate,
        num_workers=train_cfg.num_workers,
        seed=train_cfg.seed,
    )
    steps_per_epoch = max(1, len(loader))
    trainer = Trainer(
        codec_cfg,
        train_cfg,
        steps_per_epoch=steps_per_epoch,
        disc_dtype=train_cfg.disc_dtype,
    )

    rng = jax.random.PRNGKey(train_cfg.seed)
    state = trainer.init_state(rng)

    # distillation init (train_config.json:46-51): student inherits teacher
    # encoder/decoder params from a reference-format checkpoint
    state = distill_init(state, trainer, codec_cfg, train_cfg.distill or {})

    # resume from newest orbax state if present
    save_path = train_cfg.save_path
    restored = ckpt_utils.restore_train_state(save_path, state)
    if restored is not None:
        state = restored
        # deterministic record-level data resume: one step consumes one
        # batch, so the stream position is divmod(step, batches-per-epoch);
        # the fast-forward is index arithmetic (PrefetchLoader.set_state) and
        # the resumed data stream is bit-identical to an uninterrupted run
        # (assumes the same file list / batch size across the restart)
        if hasattr(loader, "set_state"):
            ep, bi = divmod(int(state.step), steps_per_epoch)
            loader.set_state(ep, bi)
        print_rank_0(
            f"Resumed from step {int(state.step)} "
            f"(data stream at epoch {int(state.step) // steps_per_epoch}, "
            f"batch {int(state.step) % steps_per_epoch})"
        )

    mesh = make_data_mesh() if use_mesh else None
    # steady-state loop never touches the previous state again -> donate it
    # (XLA aliases params/opt-moments/EMA-codebook updates in place)
    step_fn = trainer.jit_train_step(mesh, donate=True)
    eval_fn = jax.jit(trainer.eval_step)

    logger = MetricsLogger(
        log_dir or os.path.join(save_path, "logs"),
        use_wandb=bool((train_cfg.wandb or {}).get("use_wandb")),
        wandb_cfg=train_cfg.wandb,
    )
    timer = StepTimer()

    # validation streams the FULL interleaved list (<=500 files, the
    # reference design) through run_validation — nothing pre-materialized

    step = int(state.step)
    rng_step = jax.random.fold_in(rng, 1234)
    done = False
    shutdown = GracefulShutdown()
    with shutdown:
        for epoch in range(step // steps_per_epoch, train_cfg.training_epochs):
            if done:
                break
            for batch in loader:
                t0 = time.perf_counter()
                rng_step = jax.random.fold_in(rng_step, step)
                state, metrics = step_fn(state, jnp.asarray(batch), rng_step)
                step += 1

                if step % train_cfg.summary_interval == 0:
                    jax.block_until_ready(metrics)
                    dt = time.perf_counter() - t0
                    metrics = dict(metrics)
                    metrics["perf/step_time_s"] = dt
                    metrics["perf/audio_seconds_per_s"] = (
                        batch.shape[0]
                        * batch.shape[1]
                        / codec_cfg.spec.sampling_rate
                        / dt
                    )
                    logger.log(metrics, step)
                if step % train_cfg.stdout_interval == 0:
                    print_rank_0(
                        f"epoch {epoch} step {step}: "
                        f"g={float(metrics['g_loss/total']):.3f} "
                        f"d={float(metrics['d_loss/total']):.3f}"
                    )
                if (
                    step % train_cfg.validation_interval == 0
                    and validation_files
                ):
                    logger.log(
                        run_validation(
                            trainer,
                            state,
                            validation_files,
                            num_workers=train_cfg.num_workers,
                            eval_fn=eval_fn,
                            seed=train_cfg.seed,
                        ),
                        step,
                    )
                if step % train_cfg.checkpoint_interval == 0:
                    ckpt_utils.save_train_state(
                        save_path, step, state, train_cfg.num_ckpt_keep
                    )
                    ckpt_utils.save_reference_checkpoint(
                        save_path,
                        step,
                        {
                            "params": state.gen_params,
                            "codebook": state.codebook,
                        },
                        codec_cfg,
                        train_cfg.num_ckpt_keep,
                    )
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
                if shutdown.requested:
                    done = True
                    break

    if shutdown.requested and step % train_cfg.checkpoint_interval != 0:
        # preemption: persist the exact stopping point for seamless resume
        print_rank_0(f"Shutdown requested: checkpointing at step {step}")
        ckpt_utils.save_train_state(
            save_path, step, state, train_cfg.num_ckpt_keep
        )
    logger.close()
    return state


def main(argv=None):
    from ..utils.common import enable_compilation_cache

    enable_compilation_cache()
    argv = argv or sys.argv[1:]
    model_config_path = argv[0] if argv else "configs/model_config.json"
    train_config_path = argv[1] if len(argv) > 1 else "configs/train_config.json"
    codec_cfg = load_model_config(model_config_path)
    train_cfg = load_train_config(train_config_path)
    run_training(codec_cfg, train_cfg)


if __name__ == "__main__":
    main()
