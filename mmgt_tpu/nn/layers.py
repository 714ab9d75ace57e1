"""Core flax.linen layers shared by every model in the framework.

Conventions (TPU-first):
  * channel-last everywhere: images (N, H, W, C), tokens (N, L, C)
  * params live in float32 (`param_dtype`); compute dtype is configurable
    (bf16 by default at inference/training) — norm statistics and attention
    softmax always run in float32 via `mmgt_tpu.ops`
  * 1x1 convs are expressed as Dense over the trailing channel axis (XLA
    lowers both to the same MXU matmul; Dense keeps layouts trivial)
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.ops.attention import (
    dot_product_attention,
    dot_product_attention_bshd,
    packed_attention,
    packed_slab,
    use_packed_attention,
)
from mmgt_tpu.ops.norms import group_norm, layer_norm


def timestep_embedding(
    t: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding.

    `flip_sin_to_cos=True, downscale_freq_shift=0` matches the SD1.5 UNet
    time_proj; `flip_sin_to_cos=False, downscale_freq_shift=1` would match
    the classic DDPM embedding. Stage-1 SMGA uses the variant in
    `mmgt_tpu.models.smga`.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear time-embedding MLP (SD UNet style)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
        return x


class GroupNorm(nn.Module):
    """GroupNorm over trailing channels with f32 statistics.

    Applied per leading-batch element; for video tensors fold frames into
    the batch first (the reference's "InflatedGroupNorm" semantics,
    src/models/resnet.py:20-28).
    """

    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        groups = (
            self.num_groups if c % self.num_groups == 0 else math.gcd(c, self.num_groups)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, groups, scale, bias, self.eps, self.act)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.use_scale_bias:
            return layer_norm(x, None, None, self.eps)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, scale, bias, self.eps)


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> mult*dim -> dim), diffusers-compatible."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_geglu")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class _PackedQKV(nn.Module):
    """Dense projection whose weight columns are scattered into per-head
    128-lane slabs, writing the flash kernel's operand layout directly —
    no pad / head-transpose ops (see ops.attention lane-packed notes).

    Param layout is IDENTICAL to nn.Dense(use_bias=False): one "kernel"
    of shape (in_dim, heads*d) — checkpoints are oblivious to packing."""

    heads: int
    d: int
    slab: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.heads * self.d), jnp.float32,
        )
        wp = jnp.zeros((in_dim, self.heads, self.slab), self.dtype)
        wp = wp.at[..., : self.d].set(
            w.astype(self.dtype).reshape(in_dim, self.heads, self.d)
        )
        return x @ wp.reshape(in_dim, self.heads * self.slab)


class _PackedOut(nn.Module):
    """Output projection consuming lane-packed (B, L, H*slab) activations
    with an nn.Dense-identical (heads*d, out_dim) "kernel" + "bias"."""

    heads: int
    d: int
    slab: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, o: jnp.ndarray) -> jnp.ndarray:
        init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        w = self.param(
            "kernel", init, (self.heads * self.d, self.out_dim), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        wp = jnp.zeros((self.heads, self.slab, self.out_dim), self.dtype)
        wp = wp.at[:, : self.d].set(
            w.astype(self.dtype).reshape(self.heads, self.d, self.out_dim)
        )
        return o @ wp.reshape(self.heads * self.slab, self.out_dim) + b.astype(
            self.dtype
        )


class Attention(nn.Module):
    """Multi-head attention with separate context (cross) input.

    to_q/to_k/to_v have no bias, to_out has bias (diffusers Attention
    layout) so reference checkpoints map 1:1. Runs the Pallas flash kernel
    on TPU via `mmgt_tpu.ops.dot_product_attention`; long-sequence
    non-lane-aligned head dims route through the lane-packed kernel
    (same math, no layout ops — see ops.attention).
    """

    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    zero_init_out: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        kv_lens: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        b, lq = x.shape[0], x.shape[1]
        # Cross-attention over a SINGLE context token (the CLIP image embed,
        # reference pipeline_pose2vid_long.py:381-394) is exactly `v`
        # broadcast: softmax over one key is identically 1. Skip the q/k
        # projections (fed zero-length token slices so the params still
        # exist for checkpoint parity) and the attention kernel entirely.
        single_kv = context is not None and context.shape[1] == 1 and kv_lens is None
        if not single_kv and use_packed_attention(lq, ctx.shape[1], self.head_dim):
            slab = packed_slab(self.head_dim)
            qp = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                            name="to_q")(x)
            kp = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                            name="to_k")(ctx)
            vp = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                            name="to_v")(ctx)
            o = packed_attention(
                qp, kp, vp, kv_lens, 1.0 / math.sqrt(self.head_dim), slab,
                self.head_dim,
            )
            return _PackedOut(
                self.heads, self.head_dim, slab, out_dim, self.dtype,
                self.zero_init_out, name="to_out",
            )(o)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
            x[:, :0] if single_kv else x
        )
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
            ctx[:, :0] if single_kv else ctx
        )
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if single_kv:
            o = jnp.broadcast_to(v, (b, lq, inner))
        else:
            # BSHD layout: no head transposes, kernel-native head_dim
            lk = k.shape[1]
            q = q.reshape(b, lq, self.heads, self.head_dim)
            k = k.reshape(b, lk, self.heads, self.head_dim)
            v = v.reshape(b, lk, self.heads, self.head_dim)
            o = dot_product_attention_bshd(q, k, v, kv_lens=kv_lens)
            o = o.reshape(b, lq, inner)
        kernel_init = (
            nn.initializers.zeros
            if self.zero_init_out
            else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            out_dim, dtype=self.dtype, name="to_out", kernel_init=kernel_init
        )(o)
