#!/usr/bin/env python
"""Stage-2 process-1 (single-image pretrain) training CLI — the entry point
the reference calls train_stage_1.py (:283-615): trains the spatial nets
(denoising UNet without motion/audio, ReferenceNet minus its last up block,
PoseGuider) on (ref, target, pose) pairs at 256^2 with zero-SNR v-pred +
min-SNR-gamma loss."""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", nargs="+", required=True, help="meta JSON paths")
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights_dir", default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--size", type=int, default=None, help="train resolution")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke mode: tiny nets on CPU (tests/CI)")
    args = ap.parse_args()

    if args.tiny:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (in-process test run)

    from mmgt_tpu.config import Stage2ImageTrainConfig, load_config
    from mmgt_tpu.data.datasets import HumanDanceDataset
    from mmgt_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        opt_state_shardings,
        param_shardings,
        replicated,
    )
    from mmgt_tpu.training.stage2 import TrainState, encode_clip_batch
    from mmgt_tpu.training.stage2_image import Stage2ImageTrainer
    from mmgt_tpu.utils.checkpoint import CheckpointManager
    from mmgt_tpu.utils.metrics import MetricsLogger

    overrides = {
        k: v
        for k, v in {
            "batch_size": args.batch_size,
            "max_train_steps": args.max_steps,
            "checkpoint_dir": args.checkpoint_dir,
            "meta_paths": args.meta,
        }.items()
        if v is not None
    }
    if args.size:
        overrides["train_width"] = overrides["train_height"] = args.size
    cfg = load_config(Stage2ImageTrainConfig, args.config, **overrides)

    if args.tiny:
        from mmgt_tpu.models.pose_guider import PoseGuider
        from mmgt_tpu.models.unet3d import DenoisingUNet3D
        from mmgt_tpu.models.unet_ref import ReferenceUNet2D
        from mmgt_tpu.models.vae import AutoencoderKL

        tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
        trainer = Stage2ImageTrainer(
            vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
            reference_unet=ReferenceUNet2D(**tiny),
            denoising_unet=DenoisingUNet3D(
                use_motion_module=False, use_audio_module=False, **tiny
            ),
            pose_guider=PoseGuider(
                embedding_channels=16, block_out_channels=(4, 8, 8, 16)
            ),
        )
    else:
        trainer = Stage2ImageTrainer.build(dtype=jnp.bfloat16)
    for attr in ("learning_rate", "weight_decay", "max_grad_norm",
                 "snr_gamma", "noise_offset", "uncond_ratio"):
        setattr(trainer, attr, getattr(cfg, attr))
    trainer.__post_init__()  # rebuild the optimizer with the cfg lr

    ds = HumanDanceDataset(cfg.meta_paths, cfg.sample_margin)
    print(f"dataset: {len(ds)} records")

    rng = jax.random.PRNGKey(cfg.seed)
    clip_model = clip_params = None
    if args.weights_dir:
        from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
        from mmgt_tpu.training.stage1 import SMGA
        from mmgt_tpu.utils.weights import load_all_weights

        loaded = load_all_weights(
            args.weights_dir, Pose2VideoPipeline.build(dtype=jnp.bfloat16),
            SMGA(),
        )
        p2v = loaded["pose2vid"]
        params = {
            "vae": p2v["vae"],
            "reference_unet": p2v["reference_unet"],
            "denoising_unet": trainer.init_params(
                rng, cfg.train_height, cfg.train_width
            )["denoising_unet"],
            "pose_guider": p2v["pose_guider"],
        }
        clip_model = loaded.get("clip_model")
        clip_params = loaded.get("clip_params")
    else:
        params = trainer.init_params(rng, cfg.train_height, cfg.train_width)
    state = trainer.init_state(params)

    mesh = create_mesh(dp=cfg.mesh_dp, tp=cfg.mesh_tp)
    dp = mesh.shape["dp"]
    bs = max(cfg.batch_size, dp)

    mgr = CheckpointManager(cfg.checkpoint_dir, max_to_keep=5)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    state_sh = TrainState(
        step=replicated(mesh),
        trainable=param_shardings(mesh, state.trainable),
        frozen=param_shardings(mesh, state.frozen),
        opt_state=opt_state_shardings(mesh, state.opt_state, state.trainable),
    )
    state = jax.device_put(state, state_sh)
    step_fn = jax.jit(trainer.train_step, out_shardings=(state_sh, None),
                      donate_argnums=(0,))
    # clip_params as jit argument, not closure constant (remote-compile
    # bodies >~100 MB fail; see CLAUDE.md).
    _clip_raw = jax.jit(
        lambda p, imgs: encode_clip_batch(clip_model, p, imgs)
    )
    clip_fn = lambda imgs: _clip_raw(clip_params, imgs)

    it = ds.batches(bs, cfg.seed)
    mlog = MetricsLogger(cfg.checkpoint_dir, "train_stage2_image")
    t0 = time.time()
    with mesh:
        while int(state.step) < cfg.max_train_steps:
            raw = next(it)
            batch = {
                "tgt_image": raw["tgt_image"],
                "ref_image": raw["ref_image"],
                "tgt_pose": raw["tgt_pose"],
                "clip_embed": np.asarray(clip_fn(raw["clip_image"])),
            }
            batch = jax.device_put(
                jax.tree.map(jnp.asarray, batch),
                jax.tree.map(lambda x: batch_sharding(mesh, x.ndim), batch),
            )
            rng, r = jax.random.split(rng)
            state, metrics = step_fn(state, batch, r)
            step = int(state.step)
            if step % 50 == 0 or step == 1:
                mlog.log(step, metrics, echo=True)
            if step % cfg.checkpointing_steps == 0:
                mgr.save(step, jax.device_get(state))
    mgr.save(int(state.step), jax.device_get(state))
    print(f"done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
