"""Normalization ops (jnp; XLA fuses these into neighbouring elementwise ops).

Channel-last (NHWC / N...C) layout throughout — the TPU-preferred layout.
GroupNorm reductions run in float32 regardless of input dtype.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    act: Optional[str] = None,
) -> jnp.ndarray:
    """GroupNorm over the trailing channel dim of an N...C tensor.

    Statistics are computed over (all spatial dims, channels-in-group) per
    leading batch dim — equivalent to torch GroupNorm on NCHW after layout
    transposition (used by every ResNet/transformer block in the reference's
    UNets). Optional fused activation: "silu".
    """
    dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    gs = c // num_groups
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[:-1] + (num_groups, gs))
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(x.shape)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unknown fused activation {act!r}")
    return out.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
