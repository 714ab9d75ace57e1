"""Latent-space temporal interpolation (slerp) — the reference's optional
frame-rate upsampling (src/pipelines/utils.py:19 slerp;
pipeline_pose2vid_long.py:292-335 interpolate_latents)."""
from __future__ import annotations

import jax.numpy as jnp


def slerp(
    v0: jnp.ndarray, v1: jnp.ndarray, t: float, dot_threshold: float = 0.9995
) -> jnp.ndarray:
    """Spherical linear interpolation over flattened latents; falls back to
    lerp for nearly-parallel vectors."""
    f0 = v0.astype(jnp.float32).reshape(-1)
    f1 = v1.astype(jnp.float32).reshape(-1)
    n0 = f0 / jnp.maximum(jnp.linalg.norm(f0), 1e-12)
    n1 = f1 / jnp.maximum(jnp.linalg.norm(f1), 1e-12)
    dot = jnp.clip(jnp.sum(n0 * n1), -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    s0 = jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12)
    s1 = jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12)
    sl = s0 * f0 + s1 * f1
    lerp = (1.0 - t) * f0 + t * f1
    out = jnp.where(jnp.abs(dot) > dot_threshold, lerp, sl)
    return out.reshape(v0.shape).astype(v0.dtype)


def interpolate_latents(
    latents: jnp.ndarray, interpolation_factor: int
) -> jnp.ndarray:
    """(F, h, w, c) -> (F + (F-1)*(factor-1), h, w, c): slerp-inserted
    in-between frames (reference pipeline_pose2vid_long.py:292-335)."""
    if interpolation_factor < 2:
        return latents
    f = latents.shape[0]
    out = [latents[0]]
    for i in range(1, f):
        for k in range(1, interpolation_factor):
            out.append(slerp(latents[i - 1], latents[i], k / interpolation_factor))
        out.append(latents[i])
    return jnp.stack(out)
