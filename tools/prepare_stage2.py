#!/usr/bin/env python
"""Dataset preparation: raw clips -> packed .npz training records + meta JSON.

Replaces the reference's tool/ meta builders + decord-at-train-time reads
(tool/extract_meta_info_stage2_move_mask.py, src/dataset/talk_video.py):
all mp4 decoding happens once here; training reads dense arrays.

Inputs per clip (same layout the reference preprocessing produces):
  videos/{name}.mp4          target video
  dwpose/{name}.mp4          pose skeleton video (or computed from kps npy)
  face/{name}.mp4 lips/{name}.mp4 hands/{name}.mp4   mask videos
  audio_emb/{name}.npy       (T, 12, 768) wav2vec embeddings
Or, with --from_keypoints: keypoints/{name}.npy (T, 402) rasterized here.

Output: records/{name}.npz + meta.json listing them.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def mask64(frames_gray: np.ndarray, ksize: int, base: int) -> np.ndarray:
    import jax.numpy as jnp

    from mmgt_tpu.data.conditioning import _blur_norm

    return np.asarray(
        _blur_norm(jnp.asarray(frames_gray), ksize, base) * 255
    ).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--from_keypoints", action="store_true")
    args = ap.parse_args()

    import cv2

    from mmgt_tpu.utils.media import read_frames

    src, out = Path(args.src), Path(args.out)
    (out / "records").mkdir(parents=True, exist_ok=True)
    base = args.size // 8
    records = []

    for vid in sorted((src / "videos").glob("*.mp4")):
        name = vid.stem
        try:
            frames = read_frames(vid)
            t = len(frames)
            frames = np.stack(
                [cv2.resize(f, (args.size, args.size)) for f in frames]
            )
            if args.from_keypoints:
                import jax.numpy as jnp

                from mmgt_tpu.data.conditioning import (
                    prepare_conditioning_from_keypoints,
                )

                kps = np.load(src / "keypoints" / f"{name}.npy")[:t]
                cond = prepare_conditioning_from_keypoints(
                    jnp.asarray(kps), args.size, args.size
                )
                pose = (np.asarray(cond["pose_video"][0]) * 255).astype(np.uint8)
                mv = cond["mask_videos"]
                face = mask64(np.asarray(mv["face"]), 31, base)
                lips = mask64(np.asarray(mv["lips"]), 21, base)
                hands = mask64(np.asarray(mv["hands"]), 21, base)
            else:
                pose = read_frames(src / "dwpose" / f"{name}.mp4", t)
                pose = np.stack(
                    [cv2.resize(f, (args.size, args.size)) for f in pose]
                )
                face = mask64(
                    read_frames(src / "face" / f"{name}.mp4", t).mean(-1) / 255.0,
                    31, base,
                )
                lips = mask64(
                    read_frames(src / "lips" / f"{name}.mp4", t).mean(-1) / 255.0,
                    21, base,
                )
                hands_p = src / "hands" / f"{name}.mp4"
                hands = (
                    mask64(read_frames(hands_p, t).mean(-1) / 255.0, 21, base)
                    if hands_p.exists()
                    else np.zeros_like(face)
                )
            audio = np.load(src / "audio_emb" / f"{name}.npy")[:t].astype(
                np.float16
            )
            rec = out / "records" / f"{name}.npz"
            np.savez_compressed(
                rec,
                frames=frames,
                pose=pose,
                face_mask=face,
                lips_mask=lips,
                hands_mask=hands,
                audio_emb=audio,
            )
            records.append({"record": str(rec)})
            print(f"{name}: {t} frames -> {rec}")
        except Exception as e:
            print(f"[skip] {name}: {e}", file=sys.stderr)

    meta = out / "meta.json"
    meta.write_text(json.dumps(records, indent=1))
    print(f"wrote {meta} ({len(records)} records)")


if __name__ == "__main__":
    main()
