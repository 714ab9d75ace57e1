"""WavLM audio encoder (flax) — Stage-1 audio conditioning features.

Native rebuild of the vendored Microsoft WavLM
(reference data/wavlm/WavLM.py, modules_wavlm.py): layer-norm conv feature
extractor, 1024-d pre-norm transformer (24 layers for Large) with
T5-style bucketed relative position bias computed in layer 0 and *gated*
per layer (gru_rel_pos, modules_wavlm.py:388-538).

Large config: extractor_mode=layer_norm, 24 layers, dim 1024, ffn 4096,
16 heads, num_buckets 320, max_distance 800, input layer-normalized
(cfg.normalize=True, data/audio_extraction/wavlm_features.py:131-133).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mmgt_tpu.models.wav2vec2 import ConvFeatureExtractor, ConvPositionalEmbedding
from mmgt_tpu.nn.layers import LayerNorm


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int = 320, max_distance: int = 800
) -> np.ndarray:
    """T5 bidirectional bucketing (modules_wavlm.py:417-456)."""
    context = np.arange(q_len)[:, None]
    memory = np.arange(k_len)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class GatedRelPosAttention(nn.Module):
    """Self-attention with gated relative position bias."""

    heads: int
    has_rel_embed: bool
    num_buckets: int = 320
    max_distance: int = 800
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias: Optional[jnp.ndarray] = None):
        b, l, d = x.shape
        hd = d // self.heads

        if self.has_rel_embed and position_bias is None:
            buckets = jnp.asarray(
                relative_position_buckets(l, l, self.num_buckets, self.max_distance)
            )
            rel_embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (self.num_buckets, self.heads),
                jnp.float32,
            )
            position_bias = rel_embed[buckets].transpose(2, 0, 1)  # (H, L, L)

        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        qh = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)

        bias = None
        if position_bias is not None:
            # gated scaling of the shared bias. The gate input is the RAW
            # per-head hidden-state chunks, NOT the q projection: the
            # reference's vendored WavLM takes its fast path
            # (data/wavlm/modules_wavlm.py:523-534, `query` there is the
            # pre-projection attention input), which matches the HF port;
            # only the never-taken slow path (:731-737) gates on q.
            grep_a = self.param(
                "grep_a", nn.initializers.ones, (1, self.heads, 1, 1), jnp.float32
            )
            xh = x.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
            g = nn.Dense(8, dtype=self.dtype, name="grep_linear")(xh)
            g = g.reshape(b, self.heads, l, 2, 4).sum(-1)
            gate = jax.nn.sigmoid(g.astype(jnp.float32))
            gate_a, gate_b = gate[..., 0], gate[..., 1]
            gate_a_1 = gate_a * (gate_b * grep_a[..., 0] - 1.0) + 2.0  # (B,H,L)
            bias = gate_a_1[..., None] * position_bias[None]  # (B,H,L,L)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o), position_bias


class WavLMLayer(nn.Module):
    heads: int
    ff_dim: int
    has_rel_embed: bool
    num_buckets: int = 320
    max_distance: int = 800
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None):
        # pre-norm (layer_norm_first=True for Large)
        h, position_bias = GatedRelPosAttention(
            self.heads, self.has_rel_embed, self.num_buckets,
            self.max_distance, dtype=self.dtype, name="attn"
        )(LayerNorm(name="attn_norm")(x), position_bias)
        x = x + h
        h = LayerNorm(name="ff_norm")(x)
        h = nn.Dense(self.ff_dim, dtype=self.dtype, name="ff_in")(h)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(nn.gelu(h, approximate=False))
        return x, position_bias


class WavLMModel(nn.Module):
    hidden_dim: int = 1024
    num_layers: int = 24
    heads: int = 16
    ff_dim: int = 4096
    num_buckets: int = 320
    max_distance: int = 800
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav (B, samples) at 16 kHz, already layer-normalized.
        Returns (B, T', 1024) final-layer features (~50 fps)."""
        feats = ConvFeatureExtractor("layer", self.dtype, name="feature_extractor")(
            wav
        )
        h = LayerNorm(name="post_extract_norm")(feats)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="post_extract_proj")(h)
        h = h + ConvPositionalEmbedding(dtype=self.dtype, name="pos_conv")(h)
        pos_bias = None
        for i in range(self.num_layers):
            h, pos_bias = WavLMLayer(
                self.heads, self.ff_dim, i == 0, self.num_buckets,
                self.max_distance, self.dtype, name=f"layer_{i}"
            )(h, pos_bias)
        return LayerNorm(name="final_norm")(h)
