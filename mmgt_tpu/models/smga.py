"""SMGA Stage-1 model: audio -> whole-body keypoint motion diffusion.

TPU-native rebuild of the reference GestureDecoder
(src/audio2pose_model/model.py:324-490): a FiLM-conditioned transformer
denoiser that splits the 402-dim DWPose keypoint stream into face
(keypoints 24..92 -> flat dims 72:276) and body streams, runs separate
self/cross attention per stream in each of 8 decoder layers, merges by
addition, and is conditioned on WavLM+handcrafted audio tokens (1059-d),
the first pose frame, and the diffusion timestep.

Faithful quirks reproduced (they define the function the weights compute):
  * rotary embedding applied to the full 512-d model dim BEFORE the qkv
    projection, values unrotated (model.py:121,260-269,292-303)
  * the decoder stack feeds the merged output back as the FACE stream
    while the BODY stream input stays the layer-0 body embedding
    (model.py:313-321)
  * classifier-free dropout via learned null embeddings (model.py:370-371)
  * network predicts x0 directly (predict_epsilon=False, SMGA.py:95-106)
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mmgt_tpu.nn.layers import LayerNorm
from mmgt_tpu.ops.attention import dot_product_attention

NFEATS = 402
FACE_LO, FACE_HI = 72, 276  # keypoints 24..92 x (x, y, score)


def face_body_split(x: jnp.ndarray):
    """x (..., 402) -> (face_only, body_only), zero-filled complements."""
    idx = jnp.arange(NFEATS)
    face_sel = ((idx >= FACE_LO) & (idx < FACE_HI)).astype(x.dtype)
    return x * face_sel, x * (1.0 - face_sel)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffusion-timestep embedding (utils.py:37-49 semantics)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def rotary_cos_sin(n: int, dim: int, theta: float = 10000.0):
    """Interleaved rotary tables over the full model dim."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.arange(n)[:, None] * freqs[None, :]          # (n, dim/2)
    angles = np.repeat(angles, 2, axis=-1)                    # (n, dim)
    return jnp.asarray(np.cos(angles), jnp.float32), jnp.asarray(
        np.sin(angles), jnp.float32
    )


def apply_rotary(x: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, N, D) on the model dim (interleaved pairs)."""
    n, d = x.shape[-2], x.shape[-1]
    cos, sin = rotary_cos_sin(n, d)
    x2 = x.reshape(*x.shape[:-1], d // 2, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


class MHA(nn.Module):
    """torch.nn.MultiheadAttention-compatible (biased qkv + out)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        d = q_in.shape[-1]
        hd = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="to_q")(q_in)
        k = nn.Dense(d, dtype=self.dtype, name="to_k")(k_in)
        v = nn.Dense(d, dtype=self.dtype, name="to_v")(v_in)
        b, lq, lk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(b, lq, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.heads, hd).transpose(0, 2, 1, 3)
        o = dot_product_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(o)


class DenseFiLM(nn.Module):
    """Mish -> Dense(2d) FiLM generator (model.py:44-63)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_cond: jnp.ndarray):
        d = t_cond.shape[-1]
        h = nn.Dense(2 * d, dtype=self.dtype, name="proj")(mish(t_cond))
        scale, shift = jnp.split(h[:, None, :], 2, axis=-1)
        return scale, shift


def film(x, scale_shift):
    scale, shift = scale_shift
    return (scale + 1.0) * x + shift


class EncoderLayer(nn.Module):
    """Pre-norm rotary self-attention encoder layer (audio conditioning)."""

    heads: int
    ff_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(name="norm1")(x)
        qk = apply_rotary(h)
        x = x + MHA(self.heads, self.dtype, name="self_attn")(qk, qk, h)
        h = LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(nn.gelu(h, approximate=False))
        return x + h


class SplitDecoderLayer(nn.Module):
    """Face/body split FiLM decoder layer (model.py:139-308)."""

    heads: int
    ff_size: int
    dtype: jnp.dtype = jnp.float32

    def _stream(self, name, x, cond, t_cond):
        h = LayerNorm(name=f"norm_{name}_1")(x)
        qk = apply_rotary(h)
        a = MHA(self.heads, self.dtype, name=f"{name}_self_attn")(qk, qk, h)
        x = x + film(a, DenseFiLM(self.dtype, name=f"film_{name}_1")(t_cond))
        h = LayerNorm(name=f"norm_{name}_2")(x)
        q = apply_rotary(h)
        k = apply_rotary(cond)
        a = MHA(self.heads, self.dtype, name=f"{name}_cross_attn")(q, k, cond)
        x = x + film(a, DenseFiLM(self.dtype, name=f"film_{name}_2")(t_cond))
        return x

    @nn.compact
    def __call__(self, x_face, x_body, cond, t_cond):
        face = self._stream("face", x_face, cond, t_cond)
        body = self._stream("body", x_body, cond, t_cond)
        merged = face + body
        h = LayerNorm(name="norm_final")(merged)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(h)
        h = nn.Dense(merged.shape[-1], dtype=self.dtype, name="linear2")(nn.gelu(h, approximate=False))
        return merged + film(h, DenseFiLM(self.dtype, name="film_final")(t_cond))


class GestureDecoder(nn.Module):
    nfeats: int = NFEATS
    seq_len: int = 80
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    cond_feature_dim: int = 1024 + 35
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,           # (B, T, 402) noisy pose
        cond_frame: jnp.ndarray,  # (B, 402) first-frame condition
        cond: jnp.ndarray,        # (B, T, cond_feature_dim) audio features
        t: jnp.ndarray,           # (B,) diffusion timesteps
        keep_mask: Optional[jnp.ndarray] = None,  # (B,) bool; False = drop cond
    ) -> jnp.ndarray:
        b, T = x.shape[0], x.shape[1]
        d = self.latent_dim
        if keep_mask is None:
            keep_mask = jnp.ones((b,), bool)

        face_x, body_x = face_body_split(x)
        face_cf, body_cf = face_body_split(cond_frame[:, None, :])
        proj = nn.Dense(d, dtype=self.dtype, name="input_projection")
        x_face = proj(
            jnp.concatenate([face_x, jnp.broadcast_to(face_cf, face_x.shape)], -1)
        )
        x_body = proj(
            jnp.concatenate([body_x, jnp.broadcast_to(body_cf, body_x.shape)], -1)
        )

        # audio conditioning tokens
        cond_tokens = nn.Dense(d, dtype=self.dtype, name="cond_projection")(cond)
        for i in range(2):
            cond_tokens = EncoderLayer(
                self.num_heads, self.ff_size, self.dtype, name=f"cond_encoder_{i}"
            )(cond_tokens)
        null_embed = self.param(
            "null_cond_embed",
            nn.initializers.normal(1.0),
            (1, self.seq_len, d),
            jnp.float32,
        )
        km = keep_mask[:, None, None]
        cond_tokens = jnp.where(
            km, cond_tokens, null_embed[:, :T].astype(cond_tokens.dtype)
        )

        pooled = jnp.mean(cond_tokens, axis=-2)
        h = LayerNorm(name="non_attn_norm")(pooled)
        h = nn.Dense(d, dtype=self.dtype, name="non_attn_proj1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="non_attn_proj2")(nn.silu(h))
        null_hidden = self.param(
            "null_cond_hidden", nn.initializers.normal(1.0), (1, d), jnp.float32
        )
        cond_hidden = jnp.where(
            keep_mask[:, None], h, null_hidden.astype(h.dtype)
        )

        # time embedding -> FiLM condition + 2 attention tokens
        t_hidden = sinusoidal_pos_emb(t, d).astype(self.dtype)
        t_hidden = mish(nn.Dense(4 * d, dtype=self.dtype, name="time_mlp")(t_hidden))
        t_cond = nn.Dense(d, dtype=self.dtype, name="to_time_cond")(t_hidden)
        t_tokens = nn.Dense(2 * d, dtype=self.dtype, name="to_time_tokens")(
            t_hidden
        ).reshape(b, 2, d)
        t_cond = t_cond + cond_hidden

        c = jnp.concatenate([cond_tokens, t_tokens], axis=-2)
        cond_tokens = LayerNorm(name="norm_cond")(c)

        # split-stream decoder: merged output re-enters as the face stream
        out = x_face
        for i in range(self.num_layers):
            out = SplitDecoderLayer(
                self.num_heads, self.ff_size, self.dtype, name=f"decoder_{i}"
            )(out, x_body, cond_tokens, t_cond)

        return nn.Dense(self.nfeats, dtype=self.dtype, name="final_layer")(out)

    def guided_forward(self, x, cond_frame, cond, t, guidance_weight):
        """CFG as one doubled-batch forward (replaces the reference's two
        sequential forwards, model.py:420-424)."""
        b = x.shape[0]
        keep = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        out = self(
            jnp.concatenate([x, x]),
            jnp.concatenate([cond_frame, cond_frame]),
            jnp.concatenate([cond, cond]),
            jnp.concatenate([t, t]),
            keep,
        )
        unc, con = out[:b], out[b:]
        return unc + (con - unc) * guidance_weight
