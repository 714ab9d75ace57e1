"""Stage-2 conditioning preparation: keypoints -> pose video + mask pyramids.

Bridges Stage-1 pose output (or precomputed mask videos) to the pipeline's
conditioning inputs, replacing the reference's host-side chain
(scripts/audio2vid.py:377-476: pose_vid_generator -> mp4 -> read_frames ->
cv2 blur_mask -> ImageProcessor.preprocess_mov_mask) with one on-device
jnp path. Mask semantics follow scripts/pose2vid.py:265-271
(full = clamp(1 - face + lips + hands, 0, 1)); scripts/audio2vid.py:471-476
instead overwrites full with 1+lips — a reference inconsistency we do not
replicate (SURVEY §7 "known reference bugs").
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmgt_tpu.data.rasterize import rasterize_clip
from mmgt_tpu.ops.image import (
    gaussian_blur,
    mask_pyramid,
    normalize_minmax,
    resize_bilinear,
)

KP_MIN, KP_MAX = -200.0, 800.0  # global keypoint range (extract_movment_mask_all.py:121-132)
LEG_KPTS = tuple(range(9, 11)) + tuple(range(12, 14))


def normalize_keypoints(kp: jnp.ndarray) -> jnp.ndarray:
    """absolute pixel coords -> [-1, 1]."""
    return (kp - KP_MIN) / (KP_MAX - KP_MIN) * 2.0 - 1.0


def denormalize_keypoints(kp: jnp.ndarray) -> jnp.ndarray:
    return (kp + 1.0) / 2.0 * (KP_MAX - KP_MIN) + KP_MIN


def mask_leg(kp402: jnp.ndarray) -> jnp.ndarray:
    """Zero the leg keypoints (always masked, extract_movment_mask_all.py:67-95).

    kp402: (..., 402)."""
    kp = kp402.reshape(*kp402.shape[:-1], 134, 3)
    mask = jnp.ones((134,), kp.dtype).at[jnp.asarray(LEG_KPTS)].set(0.0)
    return (kp * mask[:, None]).reshape(kp402.shape)


def _blur_norm(mask: jnp.ndarray, ksize: int, base: int = 64) -> jnp.ndarray:
    """{0,1} mask -> blurred, min-max-normalized (base, base) attention mask
    (blur_mask, scripts/audio2vid.py:133-153; base = image_size // 8,
    64 for the reference's 512^2)."""
    if base < ksize:
        ksize = base if base % 2 == 1 else base - 1
    m = resize_bilinear(mask, (base, base))
    m = gaussian_blur(m, ksize)
    return normalize_minmax(m, axis=(-2, -1))  # per-frame, like blur_mask


def prepare_conditioning_from_keypoints(
    keypoints_abs: jnp.ndarray,  # (T, 402) absolute pixel coords
    height: int = 512,
    width: int = 512,
    levels: int = 3,
) -> Dict[str, jnp.ndarray]:
    """(T, 402) -> {pose_video (1,T,H,W,3), masks: levels x (full, face, lip)}.

    The returned `masks` plug straight into Pose2VideoPipeline.__call__.
    """
    kp = keypoints_abs.reshape(-1, 134, 3)
    kp_norm = kp.at[..., :2].set(kp[..., :2] / jnp.asarray([width, height]))
    ras = rasterize_clip(kp_norm, height, width)

    base = height // 8
    face64 = _blur_norm(ras["face_mask"], 31, base)
    lips64 = _blur_norm(ras["lips_mask"], 21, base)
    hands64 = _blur_norm(ras["hands_mask"], 21, base)
    full64 = jnp.clip(1.0 - face64 + lips64 + hands64, 0.0, 1.0)

    full_p = mask_pyramid(full64, levels)
    face_p = mask_pyramid(face64, levels)
    lips_p = mask_pyramid(lips64, levels)
    masks = [
        (full_p[l][None], face_p[l][None], lips_p[l][None]) for l in range(levels)
    ]
    return {
        "pose_video": ras["pose"][None],  # (1, T, H, W, 3) in [0, 1]
        "masks": masks,
        "mask_videos": {
            "face": ras["face_mask"],
            "lips": ras["lips_mask"],
            "hands": ras["hands_mask"],
        },
    }


def masks_from_videos(
    face: jnp.ndarray,   # (T, H, W) in [0, 1] (decoded mask videos)
    lips: jnp.ndarray,
    hands: Optional[jnp.ndarray] = None,
    levels: int = 3,
    base: int = 64,
) -> list:
    """pose2vid path: user-provided mask videos -> pyramid conditioning."""
    face64 = _blur_norm(face, 31, base)
    lips64 = _blur_norm(lips, 21, base)
    hands64 = (
        _blur_norm(hands, 21, base) if hands is not None else jnp.zeros_like(face64)
    )
    full64 = jnp.clip(1.0 - face64 + lips64 + hands64, 0.0, 1.0)
    full_p = mask_pyramid(full64, levels)
    face_p = mask_pyramid(face64, levels)
    lips_p = mask_pyramid(lips64, levels)
    return [
        (full_p[l][None], face_p[l][None], lips_p[l][None]) for l in range(levels)
    ]
