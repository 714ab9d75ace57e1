#!/usr/bin/env python
"""Stage-2-only inference: ref image + pose/mask videos -> video
(mirrors reference scripts/pose2vid.py:138-322; audio conditioning is
zeroed there and here)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_image", required=True)
    ap.add_argument("--pose_video", required=True)
    ap.add_argument("--face_mask", required=True)
    ap.add_argument("--lips_mask", required=True)
    ap.add_argument("--hands_mask", default=None)
    ap.add_argument("--out", default="output/pose2vid.mp4")
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights_dir", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--cfg", type=float, default=None)
    ap.add_argument("-L", "--length", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from mmgt_tpu.config import InferenceConfig, load_config
    from mmgt_tpu.data.conditioning import masks_from_videos
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.utils.media import load_image, read_frames, save_video

    overrides = {
        k: v
        for k, v in {
            "num_inference_steps": args.steps,
            "guidance_scale": args.cfg,
            "video_length": args.length,
            "weights_dir": args.weights_dir,
        }.items()
        if v is not None
    }
    cfg = load_config(InferenceConfig, args.config, **overrides)
    rng = jax.random.PRNGKey(args.seed)

    pipe = Pose2VideoPipeline.build(
        dtype=jnp.bfloat16,
        context_size=cfg.context_size,
        context_overlap=cfg.context_overlap,
        window_microbatch=cfg.window_microbatch,
    )
    if cfg.weights_dir:
        from mmgt_tpu.training.stage1 import SMGA
        from mmgt_tpu.utils.weights import load_all_weights

        params = load_all_weights(cfg.weights_dir, pipe, SMGA())["pose2vid"]
    else:
        print("[warn] random-initialized models", file=sys.stderr)
        params = pipe.init_params(rng, 64, 64)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    ref = load_image(args.ref_image, cfg.height)
    pose = read_frames(args.pose_video, cfg.video_length).astype(np.float32) / 255.0
    face = read_frames(args.face_mask, cfg.video_length).mean(-1) / 255.0
    lips = read_frames(args.lips_mask, cfg.video_length).mean(-1) / 255.0
    hands = (
        read_frames(args.hands_mask, cfg.video_length).mean(-1) / 255.0
        if args.hands_mask
        else None
    )
    L = min(len(pose), len(face), len(lips), cfg.video_length)
    pose, face, lips = pose[:L], face[:L], lips[:L]
    if hands is not None:
        hands = hands[:L]

    masks = masks_from_videos(
        jnp.asarray(face), jnp.asarray(lips),
        jnp.asarray(hands) if hands is not None else None,
        base=cfg.height // 8,
    )
    frames = pipe(
        params,
        rng,
        jnp.asarray(ref)[None] * 2 - 1,
        jnp.asarray(pose)[None],
        jnp.zeros((1, 1, 768), jnp.bfloat16),
        masks,
        None,  # audio zeroed (reference pose2vid.py:279)
        num_inference_steps=cfg.num_inference_steps,
        guidance_scale=cfg.guidance_scale,
        motion_scale=cfg.motion_scale,
    )
    save_video(np.asarray(frames[0]), args.out, fps=cfg.fps)
    print(f"wrote {args.out}: {frames.shape}")


if __name__ == "__main__":
    main()
