"""CLIP ViT image encoder (flax) — reference-image embedding for Stage 2.

Native rebuild of the CLIPVisionModelWithProjection dependency
(scripts/audio2vid.py:218-220, sd-image-variations image_encoder =
CLIP ViT-H? no — ViT-L/14 224px, hidden 1024, 24 layers, 16 heads,
projection to 768). The pipeline consumes only the projected pooled
embedding as a single context token (pipeline_pose2vid_long.py:381-394).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mmgt_tpu.nn.layers import LayerNorm
from mmgt_tpu.ops.attention import dot_product_attention

# CLIP preprocessing constants (openai/clip-vit-large-patch14)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(image01: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> resized + normalized (B, 224, 224, 3)."""
    b = image01.shape[0]
    img = jax.image.resize(image01, (b, size, size, 3), "bilinear")
    return (img - CLIP_MEAN) / CLIP_STD


class CLIPLayer(nn.Module):
    heads: int
    mlp_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        mlp = self.mlp_dim or 4 * d
        hd = d // self.heads
        h = LayerNorm(name="ln1")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        b, l = x.shape[0], x.shape[1]
        q = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        o = dot_product_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(mlp, dtype=self.dtype, name="fc1")(h)
        # CLIP uses quick_gelu: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class CLIPVisionModel(nn.Module):
    """Returns the projected image embedding (B, 1, proj_dim)."""

    hidden_dim: int = 1024
    num_layers: int = 24
    heads: int = 16
    patch: int = 14
    image_size: int = 224
    proj_dim: int = 768
    mlp_dim: Optional[int] = None  # default 4*hidden (ViT-L: 4096)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, 224, 224, 3), CLIP-normalized."""
        b = pixels.shape[0]
        d = self.hidden_dim
        x = nn.Conv(
            d, (self.patch, self.patch), strides=(self.patch, self.patch),
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(pixels)
        x = x.reshape(b, -1, d)
        n_pos = x.shape[1] + 1
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n_pos, d)
        )
        x = x + pos.astype(x.dtype)
        x = LayerNorm(name="pre_norm")(x)
        for i in range(self.num_layers):
            x = CLIPLayer(self.heads, self.mlp_dim, self.dtype, name=f"layer_{i}")(x)
        pooled = LayerNorm(name="post_norm")(x[:, 0])
        out = nn.Dense(
            self.proj_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(pooled)
        return out[:, None, :]  # (B, 1, proj_dim)
