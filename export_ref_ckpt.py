"""Convert a train_overfit orbax train state into a reference-format ``g_*``
torch checkpoint, so the trained weights flow through the SAME
`from_pretrained` machinery the reference uses (and the --ckpt probes).

Usage: env DISTILCODEC_PLATFORM=cpu python export_ref_ckpt.py \
    generated/overfit/ckpt generated/overfit/ckpt
"""

from __future__ import annotations

import sys

import jax


def main():
    state_dir = sys.argv[1] if len(sys.argv) > 1 else "generated/overfit/ckpt"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else state_dir

    from distilcodec_nabeel_tpu.config import CodecConfig, TrainConfig
    from distilcodec_nabeel_tpu.training.train import Trainer
    from distilcodec_nabeel_tpu.utils import checkpoint as ckpt_utils
    from distilcodec_nabeel_tpu.utils.common import load_json

    raw = load_json("/root/reference/configs/model_config.json")
    codec_cfg = CodecConfig.from_dict(raw)
    trainer = Trainer(
        codec_cfg, TrainConfig.from_dict({"batch_size": 1}), steps_per_epoch=1000
    )
    # abstract template only — no parameter compute.  Orbax deserialization
    # needs concrete shardings on the ShapeDtypeStructs.
    dev = jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    abstract = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding)
        if hasattr(s, "shape")
        else s,
        jax.eval_shape(
            lambda: trainer.init_state(jax.random.PRNGKey(0), segment_len=8192)
        ),
    )
    state = ckpt_utils.restore_train_state(state_dir, abstract)
    if state is None:
        raise SystemExit(f"no orbax state under {state_dir}")
    step = int(state.step)
    path = ckpt_utils.save_reference_checkpoint(
        out_dir,
        step,
        {"params": state.gen_params, "codebook": state.codebook},
        codec_cfg,
        num_ckpt_keep=30,
    )
    print(f"exported step {step} -> {path}", flush=True)


if __name__ == "__main__":
    main()
