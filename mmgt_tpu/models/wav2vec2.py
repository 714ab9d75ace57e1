"""Wav2Vec2 audio encoder (flax) — Stage-2 audio conditioning.

Native rebuild of the reference's HF-Wav2Vec2 wrapper
(src/models/wav2vec.py:21-209): base-960h architecture with the conv
features linearly interpolated to the video frame count BEFORE the
transformer, and all 12 encoder-layer hidden states returned stacked —
the (T, 12, 768) tensor AudioProjModel consumes
(src/dataset/audio_processor.py:106-127).

Base config: 7 conv layers (512ch, strides 5,2,2,2,2,2,2, kernels
10,3,3,3,3,2,2, bias=False, GroupNorm(512) after conv0 only), feature
projection to 768, conv positional embedding (k=128, groups=16), 12
post-norm transformer layers (12 heads, ff 3072, gelu).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.nn.layers import LayerNorm
from mmgt_tpu.ops.attention import dot_product_attention


def linear_interpolate_seq(x: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """(B, T, C) -> (B, seq_len, C) linear resize along T (align_corners
    False, matching F.interpolate default used at wav2vec.py:196-209)."""
    b, t, c = x.shape
    return jax.image.resize(x, (b, seq_len, c), "linear")


class ConvFeatureExtractor(nn.Module):
    """Waveform -> (B, T', 512) latent features."""

    norm_mode: str = "group"  # "group" (wav2vec2-base) | "layer" (wavlm-large)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[:, :, None]  # (B, samples, 1)
        dims = (512,) * 7
        kernels = (10, 3, 3, 3, 3, 2, 2)
        strides = (5, 2, 2, 2, 2, 2, 2)
        for i, (d, k, s) in enumerate(zip(dims, kernels, strides)):
            x = nn.Conv(
                d, (k,), strides=(s,), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if self.norm_mode == "group" and i == 0:
                scale = self.param(f"gn_{i}_scale", nn.initializers.ones, (d,))
                bias = self.param(f"gn_{i}_bias", nn.initializers.zeros, (d,))
                from mmgt_tpu.ops.norms import group_norm

                x = group_norm(x, d, scale, bias, eps=1e-5)
            elif self.norm_mode == "layer":
                x = LayerNorm(name=f"ln_{i}")(x)
            x = nn.gelu(x, approximate=False)
        return x


class TransformerLayer(nn.Module):
    heads: int
    ff_dim: int
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, bias=None):
        d = x.shape[-1]
        hd = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, l = x.shape[0], x.shape[1]
        q = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        if bias is not None:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(hd).astype(jnp.float32)
            probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            o = dot_product_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)

    @nn.compact
    def __call__(self, x, attn_bias=None):
        if self.pre_norm:
            x = x + self._attn(LayerNorm(name="attn_norm")(x), attn_bias)
            h = LayerNorm(name="ff_norm")(x)
            h = nn.Dense(self.ff_dim, dtype=self.dtype, name="ff_in")(h)
            x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(nn.gelu(h, approximate=False))
        else:
            x = LayerNorm(name="attn_norm")(x + self._attn(x, attn_bias))
            h = nn.Dense(self.ff_dim, dtype=self.dtype, name="ff_in")(x)
            h = nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(nn.gelu(h, approximate=False))
            x = LayerNorm(name="ff_norm")(x + h)
        return x


class ConvPositionalEmbedding(nn.Module):
    kernel: int = 128
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Conv(
            d, (self.kernel,), padding=self.kernel // 2,
            feature_group_count=self.groups, dtype=self.dtype, name="conv",
        )(x)
        h = h[:, : x.shape[1], :]  # even kernel -> drop trailing element
        return nn.gelu(h, approximate=False)


class Wav2Vec2Model(nn.Module):
    hidden_dim: int = 768
    num_layers: int = 12
    heads: int = 12
    ff_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, seq_len: int):
        """wav (B, samples) normalized; returns (B, seq_len, 12, 768) —
        the stacked per-layer hidden states."""
        feats = ConvFeatureExtractor("group", self.dtype, name="feature_extractor")(
            wav
        )
        feats = linear_interpolate_seq(feats, seq_len)
        h = LayerNorm(name="fp_norm")(feats)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fp_proj")(h)

        h = h + ConvPositionalEmbedding(dtype=self.dtype, name="pos_conv")(h)
        h = LayerNorm(name="encoder_norm")(h)
        layers_out = []
        for i in range(self.num_layers):
            h = TransformerLayer(
                self.heads, self.ff_dim, False, self.dtype, name=f"layer_{i}"
            )(h)
            layers_out.append(h)
        return jnp.stack(layers_out, axis=2)  # (B, T, 12, 768)
