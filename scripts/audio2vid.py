#!/usr/bin/env python
"""End-to-end audio + portrait -> video CLI (mirrors the reference's
scripts/audio2vid.py:185-530 flags on the TPU-native stack).

Usage:
  python scripts/audio2vid.py --ref_image face.png --audio speech.wav \
      --out out.mp4 [--config cfg.yaml] [--steps 30] [--cfg 3.5] [--seed 42]

Without --weights_dir the models run with random initialization (useful
for smoke runs / benchmarking; real runs need converted checkpoints, see
mmgt_tpu.utils.convert).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline(cfg, rng):
    from mmgt_tpu.pipelines.audio2vid import Audio2VideoPipeline
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.training.stage1 import SMGA
    from mmgt_tpu.utils.weights import load_all_weights

    from mmgt_tpu.diffusion import make_scheduler

    pose2vid = Pose2VideoPipeline.build(
        dtype=jnp.bfloat16,
        scheduler=make_scheduler(cfg.scheduler),
        context_size=cfg.context_size,
        context_overlap=cfg.context_overlap,
        window_microbatch=cfg.window_microbatch,
    )
    smga = SMGA(feature_type=cfg.a2p_feature_type, dtype=jnp.float32)

    rng, r1 = jax.random.split(rng)
    if cfg.weights_dir:
        weights = load_all_weights(cfg.weights_dir, pose2vid, smga)
        p2v_params, smga_params = weights["pose2vid"], weights["smga"]
        clip_model, clip_params = weights.get("clip_model"), weights.get("clip_params")
        audio_proc, wavlm_ext = weights.get("audio_processor"), weights.get("wavlm")
    else:
        print("[warn] no --weights_dir: random-initialized models", file=sys.stderr)
        p2v_params = pose2vid.init_params(r1, 64, 64)
        p2v_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            p2v_params,
        )
        smga_params = smga.init_state(r1, 1).ema_params
        clip_model = clip_params = audio_proc = wavlm_ext = None

    return Audio2VideoPipeline(
        smga=smga,
        smga_params=smga_params,
        pose2vid=pose2vid,
        pose2vid_params=p2v_params,
        clip_model=clip_model,
        clip_params=clip_params,
        audio_processor=audio_proc,
        wavlm_extractor=wavlm_ext,
        config=cfg,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_image", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--out", default="output/audio2vid.mp4")
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights_dir", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--cfg", type=float, default=None)
    ap.add_argument("-W", "--width", type=int, default=None)
    ap.add_argument("-H", "--height", type=int, default=None)
    ap.add_argument("-L", "--length", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--use_motion_selection", action="store_true")
    ap.add_argument(
        "--solver", default=None, choices=["ddim", "dpm++2m"],
        help="ddim = reference parity; dpm++2m reaches DDIM-25 accuracy "
        "at ~12-15 steps (pair with --steps 15)",
    )
    args = ap.parse_args()

    from mmgt_tpu.config import InferenceConfig, load_config
    from mmgt_tpu.utils.media import load_image, save_video

    overrides = {}
    if args.steps is not None:
        overrides["num_inference_steps"] = args.steps
    if args.cfg is not None:
        overrides["guidance_scale"] = args.cfg
    if args.width is not None:
        overrides["width"] = args.width
    if args.height is not None:
        overrides["height"] = args.height
    if args.length is not None:
        overrides["video_length"] = args.length
    if args.weights_dir is not None:
        overrides["weights_dir"] = args.weights_dir
    if args.use_motion_selection:
        overrides["use_motion_selection"] = True
    cfg = load_config(InferenceConfig, args.config, **overrides)
    if args.solver is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, scheduler=dataclasses.replace(cfg.scheduler, solver=args.solver)
        )

    rng = jax.random.PRNGKey(args.seed)
    pipe = build_pipeline(cfg, rng)

    ref = load_image(args.ref_image, cfg.height)
    # portrait keypoints: from DWPose if weights available, else a centered
    # default skeleton (process_reference_image equivalent)
    from mmgt_tpu.data.pose_init import portrait_keypoints

    init_kp = portrait_keypoints(ref, cfg.height, cfg.width)

    out = pipe(rng, args.audio, ref, init_kp)
    save_video(out["frames"], args.out, fps=cfg.fps, audio_wav=args.audio)
    print(f"wrote {args.out}: {out['frames'].shape}")


if __name__ == "__main__":
    main()
