#!/usr/bin/env python
"""Stage-2 (temporal/audio fine-tune) training CLI
(reference train_stage_2.py:399-962): dp/tp-mesh jitted steps, selective
trainability, min-SNR v-pred loss, orbax checkpoints."""
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
    ap.add_argument("--val_ref", default=None, help="validation ref image")
    ap.add_argument("--val_record", default=None,
                    help="validation .npz record (pose+masks+audio)")
    ap.add_argument("--val_every", type=int, default=500)
    args = ap.parse_args()

    from mmgt_tpu.config import Stage2TrainConfig, load_config
    from mmgt_tpu.data.datasets import TalkingVideoDataset
    from mmgt_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        opt_state_shardings,
        param_shardings,
        replicated,
    )
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.training.stage2 import Stage2Trainer, TrainState
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
    cfg = load_config(Stage2TrainConfig, args.config, **overrides)

    pipe = Pose2VideoPipeline.build(dtype=jnp.bfloat16)
    trainer = Stage2Trainer(
        pipe,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        max_grad_norm=cfg.max_grad_norm,
        snr_gamma=cfg.snr_gamma,
        noise_offset=cfg.noise_offset,
        uncond_img_ratio=cfg.uncond_img_ratio,
        uncond_audio_ratio=cfg.uncond_audio_ratio,
        motion_scale=tuple(cfg.motion_scale),
    )
    ds = TalkingVideoDataset(
        cfg.meta_paths, cfg.n_sample_frames, cfg.audio_margin
    )
    print(f"dataset: {len(ds)} clips")

    rng = jax.random.PRNGKey(cfg.seed)
    loaded = {}
    if cfg.weights_dir or args.weights_dir:
        from mmgt_tpu.training.stage1 import SMGA
        from mmgt_tpu.utils.weights import load_all_weights

        loaded = load_all_weights(
            args.weights_dir or cfg.weights_dir, pipe, SMGA()
        )
        params = loaded["pose2vid"]
    else:
        params = pipe.init_params(rng, cfg.train_height, cfg.train_width)
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

    from mmgt_tpu.training.stage2 import encode_clip_batch

    clip_model = loaded.get("clip_model")
    clip_params = loaded.get("clip_params")
    # clip_params is a jit *argument* (XLA parameter), not a closure
    # constant: embedded constants >~100 MB break the remote compile relay.
    _clip_raw = jax.jit(
        lambda p, imgs: encode_clip_batch(clip_model, p, imgs)
    )
    clip_fn = lambda imgs: _clip_raw(clip_params, imgs)

    it = ds.batches(bs, cfg.seed)
    mlog = MetricsLogger(cfg.checkpoint_dir, "train_stage2")
    t0 = time.time()
    with mesh:
        while int(state.step) < cfg.max_train_steps:
            batch = next(it)
            batch = {
                "pixel_values": batch["pixel_values"],
                "ref_image": batch["ref_image"],
                # dataset clip_image -> CLIP embedding (zeros when no CLIP
                # weights: equivalent to permanent uncond-image dropout)
                "clip_embed": np.asarray(clip_fn(batch["clip_image"])),
                "audio_embeds": batch["audio_embeds"],
                "pose_video": batch["pose_video"],
                "masks": batch["masks"],
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
            if args.val_ref and args.val_record and step % args.val_every == 0:
                _log_validation(pipe, trainer, state, args, cfg, step)
    mgr.save(int(state.step), jax.device_get(state))
    print("done")


def _log_validation(pipe, trainer, state, args, cfg, step):
    """Generate a validation clip with the current weights (the reference's
    log_validation, train_stage_2.py:214-396 — wired in, not commented out)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmgt_tpu.training.stage2 import merge_params
    from mmgt_tpu.utils.media import load_image, save_video

    params = merge_params(
        jax.device_get(state.trainable), jax.device_get(state.frozen)
    )
    ref = load_image(args.val_ref, cfg.train_height)
    with np.load(args.val_record) as z:
        f = min(z["frames"].shape[0], cfg.n_sample_frames)
        pose = z["pose"][:f].astype(np.float32) / 255.0
        face = z["face_mask"][:f].astype(np.float32) / 255.0
        lips = z["lips_mask"][:f].astype(np.float32) / 255.0
        audio = z["audio_emb"][:f].astype(np.float32)
    full = np.clip(1.0 - face, 0.0, 1.0)
    h8 = face.shape[-1]
    masks = []
    for l in range(3):
        k = 1 << l
        dn = lambda m: m.reshape(f, h8 // k, k, h8 // k, k).mean((2, 4)).reshape(1, f, -1)
        masks.append((dn(full), dn(face), dn(lips)))
    idx = np.clip(np.arange(f)[:, None] + np.arange(-2, 3)[None, :], 0, f - 1)
    audio_w = audio[idx][None]
    frames = pipe(
        params,
        jax.random.PRNGKey(0),
        jnp.asarray(ref)[None] * 2 - 1,
        jnp.asarray(pose)[None],
        jnp.zeros((1, 1, 768)),
        [tuple(jnp.asarray(m) for m in lv) for lv in masks],
        jnp.asarray(audio_w),
        num_inference_steps=20,
        guidance_scale=3.5,
        motion_scale=tuple(cfg.motion_scale),
    )
    out = f"{cfg.checkpoint_dir}/val_{step}.mp4"
    save_video(np.asarray(frames[0]), out, fps=25)
    print(f"[val] wrote {out}")


if __name__ == "__main__":
    main()
