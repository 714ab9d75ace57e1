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
    packed_attention_2seg,
    packed_slab,
    use_packed_attention,
)
from mmgt_tpu.ops.fused_ln import ln_projections, use_fused_ln
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
    """LayerNorm with f32 statistics.

    `params_only=True` declares the same scale/bias params (identical
    checkpoint paths) but returns them instead of normalizing — callers
    hand them to a consumer that fuses the normalization into its own
    kernel (`mmgt_tpu.ops.fused_ln`)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_scale_bias: bool = True
    params_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if not self.use_scale_bias:
            return layer_norm(x, None, None, self.eps)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.params_only:
            return scale, bias
        return layer_norm(x, scale, bias, self.eps)


class DenseW(nn.Module):
    """nn.Dense twin (identical "kernel"/"bias" params and numerics) that
    can hand out its compute-dtype weights instead of applying them, for
    callers that fuse the matmul into a Pallas kernel."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_weights: bool = False):
        in_dim = x.shape[-1]
        w = self.param(
            "kernel", self.kernel_init, (in_dim, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else jnp.zeros((self.features,), jnp.float32)
        )
        if return_weights:
            return w.astype(self.dtype), b
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        return y + b.astype(y.dtype) if self.use_bias else y


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> mult*dim -> dim), diffusers-compatible.

    `pre_norm=(scale, bias, eps)`: the caller's LayerNorm params — fused
    into the GEGLU projection on TPU (`ops.fused_ln`), applied as a plain
    layer_norm otherwise."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_norm=None) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = DenseW(inner * 2, dtype=self.dtype, name="proj_geglu")
        if pre_norm is not None:
            scale, bias, eps = pre_norm
            if use_fused_ln(x.shape[1]):
                w, b = proj(x, return_weights=True)
                (h,) = ln_projections(x, scale, bias, (w,), (b,), eps)
            else:
                h = proj(layer_norm(x, scale, bias, eps))
        else:
            h = proj(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


def pack_qkv_weight(w: jnp.ndarray, heads: int, d: int, slab: int,
                    dtype) -> jnp.ndarray:
    """Scatter an (in_dim, heads*d) projection kernel into per-head
    128-lane slabs -> (in_dim, heads*slab); padded lanes are exact zeros
    (shared by `_PackedQKV` and the pipeline's bank-K/V precompute so both
    produce bit-identical operands)."""
    in_dim = w.shape[0]
    wp = jnp.zeros((in_dim, heads, slab), dtype)
    wp = wp.at[..., :d].set(w.astype(dtype).reshape(in_dim, heads, d))
    return wp.reshape(in_dim, heads * slab)


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
    def __call__(self, x: jnp.ndarray, return_weight: bool = False):
        in_dim = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.heads * self.d), jnp.float32,
        )
        wp = pack_qkv_weight(w, self.heads, self.d, self.slab, self.dtype)
        if return_weight:
            return wp
        return x @ wp


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
        pre_norm=None,
        bank: Optional[jnp.ndarray] = None,
        bank_kv=None,
    ) -> jnp.ndarray:
        """pre_norm=(scale, bias, eps): the caller's LayerNorm params —
        attention runs over LN(x), with the normalization fused into the
        q/k/v projections on TPU (`ops.fused_ln`). `bank`: reference
        tokens (already normalized by the ReferenceNet) appended to the
        self-attention K/V; callers gate them per row via `kv_lens`.
        `bank_kv`: optional (k, v) pair of PRE-PROJECTED lane-packed bank
        operands, batch 1 (`Pose2VideoPipeline` computes them once per
        generation) — the packed route then runs the two-segment kernel
        with no per-step bank projection/concat; non-packed routes fall
        back to projecting `bank` (pass both when routing is dynamic)."""
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        b, lq = x.shape[0], x.shape[1]
        if (bank is not None or bank_kv is not None) and context is not None:
            raise ValueError("bank extends SELF-attention K/V only")
        # Cross-attention over a SINGLE context token (the CLIP image embed,
        # reference pipeline_pose2vid_long.py:381-394) is exactly `v`
        # broadcast: softmax over one key is identically 1. Skip the q/k
        # projections (fed zero-length token slices so the params still
        # exist for checkpoint parity), the attention kernel, AND any
        # pre-norm (the output does not depend on x) entirely.
        single_kv = context is not None and context.shape[1] == 1 and kv_lens is None
        bank_len = (
            bank.shape[1] if bank is not None
            else bank_kv[0].shape[1] if bank_kv is not None
            else 0
        )
        lk_total = ctx.shape[1] + bank_len
        if not single_kv and use_packed_attention(lq, lk_total, self.head_dim):
            slab = packed_slab(self.head_dim)
            to_q = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                              name="to_q")
            to_k = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                              name="to_k")
            to_v = _PackedQKV(self.heads, self.head_dim, slab, self.dtype,
                              name="to_v")
            if pre_norm is not None and context is None and use_fused_ln(lq):
                scale_p, bias_p, eps = pre_norm
                wq = to_q(x, return_weight=True)
                wk = to_k(x, return_weight=True)
                wv = to_v(x, return_weight=True)
                zb = jnp.zeros((self.heads * slab,), jnp.float32)
                qp, kp, vp = ln_projections(
                    x, scale_p, bias_p, (wq, wk, wv), (zb, zb, zb), eps
                )
            else:
                x_n = (
                    layer_norm(x, pre_norm[0], pre_norm[1], pre_norm[2])
                    if pre_norm is not None
                    else x
                )
                c_n = x_n if context is None else ctx
                qp, kp, vp = to_q(x_n), to_k(c_n), to_v(c_n)
            if bank_kv is not None:
                o = packed_attention_2seg(
                    qp, kp, vp, bank_kv[0], bank_kv[1], kv_lens,
                    1.0 / math.sqrt(self.head_dim), slab, self.head_dim,
                )
            else:
                if bank is not None:
                    kp = jnp.concatenate([kp, to_k(bank)], axis=1)
                    vp = jnp.concatenate([vp, to_v(bank)], axis=1)
                o = packed_attention(
                    qp, kp, vp, kv_lens, 1.0 / math.sqrt(self.head_dim), slab,
                    self.head_dim,
                )
            return _PackedOut(
                self.heads, self.head_dim, slab, out_dim, self.dtype,
                self.zero_init_out, name="to_out",
            )(o)
        if bank_kv is not None and bank is None:
            raise ValueError(
                "bank_kv requires the packed attention route; pass the raw "
                "bank too when routing is shape- or backend-dependent"
            )
        x_in = (
            layer_norm(x, pre_norm[0], pre_norm[1], pre_norm[2])
            if pre_norm is not None and not single_kv
            else x
        )
        kv = x_in if context is None else ctx
        if bank is not None:
            kv = jnp.concatenate([x_in, bank], axis=1)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
            x_in[:, :0] if single_kv else x_in
        )
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
            kv[:, :0] if single_kv else kv
        )
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv)

        kernel_init = (
            nn.initializers.zeros
            if self.zero_init_out
            else nn.initializers.lecun_normal()
        )
        to_out = nn.Dense(
            out_dim, dtype=self.dtype, name="to_out", kernel_init=kernel_init
        )
        if single_kv:
            # o would be v broadcast over lq — rank-1, so to_out commutes
            # with the broadcast: project the single token and broadcast
            # AFTER, replacing an (lq x inner x out) matmul of identical
            # rows with a 1-token one.
            return jnp.broadcast_to(to_out(v), (b, lq, out_dim))
        # BSHD layout: no head transposes, kernel-native head_dim
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.head_dim)
        k = k.reshape(b, lk, self.heads, self.head_dim)
        v = v.reshape(b, lk, self.heads, self.head_dim)
        o = dot_product_attention_bshd(q, k, v, kv_lens=kv_lens)
        return to_out(o.reshape(b, lq, inner))
