"""UNet building blocks: resnets, spatial/temporal/audio transformers.

All blocks are channel-last and operate on frame-folded tensors
(N = batch*frames, H, W, C) for spatial ops; temporal ops receive the
`video_length` to unfold. This is the TPU-native equivalent of the
reference's "inflated" 2D-ops-over-frames design (src/models/resnet.py:9-28)
— here the fold is just a reshape the compiler sees through.

Reference-feature injection is functional: the ReferenceNet returns a list
of per-block bank tensors; the denoising UNet's transformer blocks take the
matching bank as an ordinary input and concatenate it into self-attention
K/V (replacing the reference's monkeypatch machinery,
src/models/mutual_self_attention.py:93-302).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.nn.layers import Attention, DenseW, FeedForward, GroupNorm, LayerNorm

# A/B gate for Upsample's 4-phase coarse-grid decomposition (exact either way)
PHASE_DECOMPOSED_UPSAMPLE = True


# --------------------------------------------------------------------------
# resnet / sampling blocks
# --------------------------------------------------------------------------
class ResnetBlock(nn.Module):
    """GN-SiLU-conv x2 with time-embedding add (SD UNet resnet).

    x: (N, H, W, C); temb: (N, Cte) or None.
    """

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None):
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv. Padding must be EXPLICIT: torch's UNet
    downsampler pads 1 symmetrically (reference resnet.py Downsample3D /
    diffusers Downsample2D(padding=1)), while flax's SAME pad for stride 2
    on even extents is (0,1) — a half-pixel grid shift that silently breaks
    checkpoint parity (caught by tests/test_unet_full_torch_parity.py).
    The diffusers VAE encoder is the odd one out: Downsample2D(padding=0)
    + manual F.pad (0,1,0,1) — pass pad=((0,1),(0,1)) there."""

    dtype: jnp.dtype = jnp.float32
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding=self.pad,
            dtype=self.dtype, name="conv",
        )(x)


class _Conv3Params(nn.Module):
    """Bare (3,3,C,C) conv params with nn.Conv's exact tree layout/init —
    consumed by Upsample's phase decomposition instead of being applied on
    the upsampled grid (checkpoints and converters are oblivious)."""

    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class Upsample(nn.Module):
    """Nearest-x2 -> 3x3 SAME conv (reference src/models/resnet.py:31-60 /
    the SD upsampler), computed as an EXACT 4-phase decomposition: output
    pixel (2i+di, 2j+dj) reads a 2x2 coarse window whose taps are sums of
    the 3x3 kernel's rows/cols (nearest duplication folds fine taps that
    hit the same coarse pixel). One 2x2 conv with 4C outputs on the COARSE
    grid + interleave: 2.25x fewer conv MACs and no 4x-size upsampled
    intermediate in HBM (PERF.md backlog #2)."""

    dtype: jnp.dtype = jnp.float32
    # None -> module global (A/B tracing, tools/profile_vae.py);
    # False = literal resize->conv composition
    phase_decomposed: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        decomposed = (
            PHASE_DECOMPOSED_UPSAMPLE
            if self.phase_decomposed is None
            else self.phase_decomposed
        )
        if not decomposed:
            x = jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")
            return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv")(x)
        kernel, bias = _Conv3Params(c, name="conv")()
        wk = kernel.astype(self.dtype)
        # phase di=0 reads coarse rows {i-1, i}: row weights (W0, W1+W2);
        # phase di=1 reads rows {i, i+1}: (W0+W1, W2); same per column.
        r0 = jnp.stack([wk[0], wk[1] + wk[2]], 0)      # (2, 3, C, C)
        r1 = jnp.stack([wk[0] + wk[1], wk[2]], 0)

        def colmix(r, dj):
            if dj == 0:
                return jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], 1)
            return jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], 1)  # (2, 2, C, C)

        k4 = jnp.concatenate(
            [colmix(r0, 0), colmix(r0, 1), colmix(r1, 0), colmix(r1, 1)], -1
        )  # (2, 2, C, 4C) — one MXU call instead of four
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            p, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (n, h+1, w+1, 4C); phases are shifted slices of one output
        p00 = y[:, :h, :w, :c]
        p01 = y[:, :h, 1:, c : 2 * c]
        p10 = y[:, 1:, :w, 2 * c : 3 * c]
        p11 = y[:, 1:, 1:, 3 * c :]
        out = jnp.stack([p00, p01, p10, p11], 3).reshape(n, h, w, 2, 2, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)
        return out + bias.astype(out.dtype)


# --------------------------------------------------------------------------
# transformer blocks
# --------------------------------------------------------------------------
class BasicTransformerBlock(nn.Module):
    """ReferenceNet-side block: self-attn, CLIP cross-attn, GEGLU ff.

    Returns (out, bank) where bank = norm1(x) — the tensor the denoiser's
    matching block concatenates into its self-attention K/V.
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray):
        normed = LayerNorm(name="norm1")(x)
        bank = normed
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype, name="attn1")(
            normed
        )
        attn2 = Attention(self.heads, self.head_dim, dtype=self.dtype, name="attn2")
        if context.shape[1] == 1:
            # 1-token cross-attention ignores its query input (see
            # TemporalBasicTransformerBlock) — skip norm2, keep its params
            LayerNorm(name="norm2", params_only=True)(x)
            x = x + attn2(x, context)
        else:
            x = x + attn2(LayerNorm(name="norm2")(x), context)
        x = x + FeedForward(dtype=self.dtype, name="ff")(LayerNorm(name="norm3")(x))
        return x, bank


class TemporalBasicTransformerBlock(nn.Module):
    """Denoiser-side block: reference-augmented self-attn + CLIP cross-attn.

    x: (B*F, L, C). `bank`: (B, L_ref, C) reference features, repeated per
    frame inside. `bank_gate` (B,) in {0, 1}: rows with gate 0 (the CFG
    unconditional half, or training-time reference dropout) self-attend
    WITHOUT the bank while gated rows attend to [self, bank] — matching the
    reference's uc_mask semantics (mutual_self_attention.py:160-186).
    Implemented as one variable-KV-length flash-attention call: bank tokens
    sit at the end of KV and masked rows stop at L (the kernel skips the
    fully-masked blocks, so ungated rows pay no extra FLOPs).
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        bank: Optional[jnp.ndarray] = None,
        video_length: int = 1,
        bank_gate: Optional[jnp.ndarray] = None,
        bank_kv=None,
    ):
        # norm1 is fused into attn1's q/k/v projections (ops.fused_ln):
        # the normalized tensor never hits HBM on the TPU path
        pn1 = LayerNorm(name="norm1", params_only=True)(x)
        attn1 = Attention(self.heads, self.head_dim, dtype=self.dtype, name="attn1")

        if bank is None and bank_kv is None:
            x = x + attn1(x, pre_norm=(*pn1, 1e-5))
        else:
            f = video_length
            l = x.shape[1]
            l_ref = bank.shape[1] if bank is not None else bank_kv[0].shape[1]
            # raw-bank fallback operand (projected only on non-packed
            # routes; the packed route consumes the cached bank_kv)
            bank_f = (
                jnp.repeat(bank, f, axis=0) if bank is not None else None
            )  # (B*F, L_ref, C)
            if bank_gate is not None:
                gate_f = jnp.repeat(bank_gate.astype(jnp.int32), f, axis=0)
                kv_lens = l + gate_f * l_ref
            else:
                kv_lens = None
            x = x + attn1(
                x, kv_lens=kv_lens, pre_norm=(*pn1, 1e-5), bank=bank_f,
                bank_kv=bank_kv,
            )

        attn2 = Attention(self.heads, self.head_dim, dtype=self.dtype, name="attn2")
        if context.shape[1] == 1:
            # single-KV-token cross-attention ignores its query input
            # entirely (softmax over one key is 1 -> output is to_out(v));
            # skip norm2's 315 MB materialization, declaring its params
            # for checkpoint parity
            LayerNorm(name="norm2", params_only=True)(x)
            x = x + attn2(x, context)
        else:
            x = x + attn2(LayerNorm(name="norm2")(x), context)
        pn3 = LayerNorm(name="norm3", params_only=True)(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(x, pre_norm=(*pn3, 1e-5))
        return x


class CrossAttnProj(nn.Module):
    """q/k/v/out projections of one cross-attention (param layout matches
    `Attention`: biasless qkv, biased out) with the attention math hoisted
    out so several regions can share one batched attention call."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        self.to_q = DenseW(inner, use_bias=False, dtype=self.dtype)
        self.to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_out = DenseW(inner, dtype=self.dtype)

    def q_weight(self, x):
        """Compute-dtype q kernel, for fusing the caller's LN into the
        three q projections in one `ln_projections` call."""
        w, _ = self.to_q(x, return_weights=True)
        return w

    def q(self, x):
        b, lq = x.shape[0], x.shape[1]
        return self.to_q(x).reshape(b, lq, self.heads, self.head_dim)

    def kv(self, ctx):
        b, lk = ctx.shape[0], ctx.shape[1]
        sh = lambda t: t.reshape(b, lk, self.heads, self.head_dim)
        return sh(self.to_k(ctx)), sh(self.to_v(ctx))

    def qkv(self, x, ctx):
        """BSHD (no head transpose) q/k/v."""
        k, v = self.kv(ctx)
        return self.q(x), k, v


class AudioTransformerBlock(nn.Module):
    """MM-HAA block: self-attn + 3 parallel masked audio cross-attentions.

    The paper's core mechanism (reference src/models/attention.py:486-771):
    three audio cross-attentions whose outputs are gated by resolution-
    matched full/face/lip spatial masks, passed through zero-init 1x1
    convs, scaled by motion_scale=[pose, face, lip] and summed residually.
    The three attentions share ONE batched attention call (stacked on the
    head axis) — same math, a third of the kernel launches.

    x: (B*F, L, C); audio_tokens: (B*F, L_a, 768);
    masks: (full, face, lip), each (B*F, L); motion_scale: length-3.

    `n_uncond_rows` (static): the first n rows are the CFG uncond half,
    whose audio tokens the pipeline zeroes. With biasless k/v projections,
    zero tokens give v = 0 exactly, so each attention output is 0 and the
    branch collapses to the closed form
        x + sum_i scale_i * (mask_i * (b_out_i @ W_zc_i) + b_zc_i)
    — computed from the params alone. The q projections, the attention and
    the out/zero-conv matmuls are skipped for those rows (same numbers, a
    different — cheaper — contraction path).
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        audio_tokens: jnp.ndarray,
        masks: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        motion_scale: Sequence[float] = (1.0, 1.0, 1.0),
        n_uncond_rows: int = 0,
    ):
        from mmgt_tpu.ops.attention import dot_product_attention_bshd
        from mmgt_tpu.ops.fused_ln import ln_projections, use_fused_ln
        from mmgt_tpu.ops.norms import layer_norm

        pn1 = LayerNorm(name="norm1", params_only=True)(x)
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype, name="attn1")(
            x, pre_norm=(*pn1, 1e-5)
        )

        nu = n_uncond_rows
        pn2 = LayerNorm(name="norm2", params_only=True)(x)
        projs = [
            CrossAttnProj(self.heads, self.head_dim, self.dtype, name=f"attn2_{i}")
            for i in range(3)
        ]
        zero_convs = [
            # zero-initialized 1x1 conv == Dense on channel-last tokens
            # (DenseW: identical params/numerics, but hands out its weights
            # so the 3 branches batch into block matmuls below)
            DenseW(
                x.shape[-1],
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"zero_conv_{i}",
            )
            for i in range(3)
        ]
        b, lq = x.shape[0], x.shape[1]
        xc = x[nu:]
        if use_fused_ln(lq):
            # norm2 fuses into the three q projections (one kernel); the
            # audio k/v (32 tokens) are cheap plain projections
            zb = jnp.zeros((self.heads * self.head_dim,), jnp.float32)
            q3 = ln_projections(
                xc, *pn2, tuple(p.q_weight(xc) for p in projs), (zb, zb, zb), 1e-5
            )
            qs = tuple(
                q.reshape(b - nu, lq, self.heads, self.head_dim) for q in q3
            )
        else:
            normed = layer_norm(xc, *pn2, 1e-5)
            qs = tuple(p.q(normed) for p in projs)
        ks, vs = zip(*[p.kv(audio_tokens[nu:]) for p in projs])
        o = dot_product_attention_bshd(
            jnp.concatenate(qs, 2), jnp.concatenate(ks, 2), jnp.concatenate(vs, 2)
        )
        # the 3 branches' out / zero-conv projections batch into TWO block
        # matmuls instead of 6: heads of attention i occupy head-block i of
        # `o`, so (B,L,3,inner) x (3,inner,C) is one batched dot, and the
        # mask·scale-gated zero convs contract jointly over the stacked
        # (3C, C) kernel — Σ_i s_i·zc_i(m_i·h_i) in one MXU call.
        c_dim = x.shape[-1]
        inner = self.heads * self.head_dim
        # load-bearing invariant of the batched form: the (3C,C) zero-conv
        # stack and the (3,inner,C) out stack both assume inner == C (true
        # for every UNet width; reference attention.py:518-529 likewise).
        assert inner == c_dim, (inner, c_dim)
        o3 = o.reshape(b - nu, lq, 3, inner)
        wo, bo = zip(*[p.to_out(o3[:, :1, i], return_weights=True)
                       for i, p in enumerate(projs)])
        wz, bz = zip(*[zc(x[:1, :1], return_weights=True)
                       for zc in zero_convs])
        scales = jnp.asarray(motion_scale, self.dtype)           # (3,)
        h3 = jnp.einsum("blid,idc->blic", o3, jnp.stack(wo))
        h3 = h3 + jnp.stack(bo).astype(h3.dtype)[None, None]
        mask3 = jnp.stack([m[nu:] for m in masks], 2).astype(h3.dtype)
        h3 = h3 * (mask3 * scales[None, None, :])[..., None]
        w_zc = jnp.concatenate(wz, 0)                            # (3C, C)
        b_zc3 = jnp.stack(bz).astype(self.dtype)                 # (3, C)
        delta = h3.reshape(b - nu, lq, 3 * c_dim) @ w_zc
        out_c = xc + delta + (scales[:, None] * b_zc3).sum(0)
        if nu:
            # uncond closed form: x + Σ_i s_i·(mask_i·(b_out_i@W_zc_i)+b_zc_i)
            zc_b = jnp.stack(
                [b.astype(self.dtype) @ w for b, w in zip(bo, wz)]
            )                                                    # (3, C)
            mask_u3 = jnp.stack([m[:nu] for m in masks], 2).astype(self.dtype)
            hu = jnp.einsum("bli,ic->blc", mask_u3 * scales[None, None, :], zc_b)
            out_u = x[:nu] + hu + (scales[:, None] * b_zc3).sum(0)
            x = jnp.concatenate([out_u, out_c], 0)
        else:
            x = out_c
        pn3 = LayerNorm(name="norm3", params_only=True)(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(x, pre_norm=(*pn3, 1e-5))
        return x


# --------------------------------------------------------------------------
# spatial transformer wrappers (GN + proj_in/out + residual)
# --------------------------------------------------------------------------
def _flatten_hw(x):
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c), (h, w)


def _unflatten_hw(x, hw):
    n, l, c = x.shape
    return x.reshape(n, hw[0], hw[1], c)


class SpatialTransformer2D(nn.Module):
    """ReferenceNet transformer: returns (out, bank)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray):
        residual = x
        h = GroupNorm(32, 1e-6, name="norm")(x)
        tokens, hw = _flatten_hw(h)
        tokens = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_in")(tokens)
        tokens, bank = BasicTransformerBlock(
            self.heads, self.head_dim, self.dtype, name="block"
        )(tokens, context)
        tokens = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_out")(tokens)
        return _unflatten_hw(tokens, hw) + residual, bank


class SpatialTransformerRef(nn.Module):
    """Denoiser transformer with reference-bank self-attention."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        bank: Optional[jnp.ndarray],
        video_length: int,
        bank_gate: Optional[jnp.ndarray] = None,
        bank_kv=None,
    ):
        residual = x
        h = GroupNorm(32, 1e-6, name="norm")(x)
        tokens, hw = _flatten_hw(h)
        tokens = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_in")(tokens)
        tokens = TemporalBasicTransformerBlock(
            self.heads, self.head_dim, self.dtype, name="block"
        )(tokens, context, bank, video_length, bank_gate, bank_kv)
        tokens = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_out")(tokens)
        return _unflatten_hw(tokens, hw) + residual


class SpatialTransformerAudio(nn.Module):
    """MM-HAA audio transformer wrapper.

    `inner_dim` can differ from the channel count — the reference sizes the
    audio attention width from the *block input* channels
    (unet_3d_blocks.py:466-470), so e.g. the 640-ch block's first audio
    module runs at 320; reproduced here for weight parity.
    """

    heads: int
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        audio_tokens: jnp.ndarray,
        masks,
        motion_scale: Sequence[float] = (1.0, 1.0, 1.0),
        n_uncond_rows: int = 0,
    ):
        residual = x
        h = GroupNorm(32, 1e-6, name="norm")(x)
        tokens, hw = _flatten_hw(h)
        tokens = nn.Dense(self.inner_dim, dtype=self.dtype, name="proj_in")(tokens)
        tokens = AudioTransformerBlock(
            self.heads, self.inner_dim // self.heads, self.dtype, name="block"
        )(tokens, audio_tokens, masks, motion_scale, n_uncond_rows)
        tokens = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_out")(tokens)
        return _unflatten_hw(tokens, hw) + residual


# --------------------------------------------------------------------------
# temporal (motion) module
# --------------------------------------------------------------------------
def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """Interleaved sin/cos positional table (AnimateDiff motion PE,
    reference motion_module.py:262-277)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


FORCE_TEMPORAL_LAYOUT = None  # tests: "tokens" | "lanes" | None (auto)


class TemporalAttention(nn.Module):
    """Frame-axis attention computed without (B*HW, F, C) transposes,
    which otherwise dominate motion-module cost (the per-module layout
    shuffle moves hundreds of MB through HBM). With F ~ 12 the per-
    position F x F x D attention matmuls are far below MXU tile size
    (0.3% utilization as batched dots); formulate as broadcast multiply +
    reduce so it runs on the VPU and fuses.

    Two equivalent formulations, picked at trace time:
      * "tokens": everything in (B, F, L, H, D) with D minor — simple,
        but D=40/80 and H=8 minors force padded (8,128) VPU tiles.
      * "lanes" (TPU): q/k/v produced directly in (H, D, B, F, L) by
        contraction-order choice (every einsum below is in the dot's
        NATURAL output order, so XLA inserts no transposes), keeping the
        128-aligned L axis minor through logits, softmax and the
        weighted sum — full lane utilization on the VPU.

    Param names match `Attention` (to_q/k/v/out) for converter parity.
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    fuse_kernel: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_norm=None, pe=None):
        """Without `pre_norm`, x is the (already normalized) attention
        input and the ATTENTION OUTPUT is returned. With
        `pre_norm=(scale, bias, eps)` (+ `pe` (F, C)), x is the raw block
        stream and the module returns x + attn(LN(x) + pe) — fused into
        one Pallas kernel on TPU (`ops.motion_attention`, unless
        `fuse_kernel=False`), composed from XLA ops elsewhere."""
        b, f, l, c = x.shape
        inner = self.heads * self.head_dim
        layout = FORCE_TEMPORAL_LAYOUT or (
            "lanes" if jax.default_backend() == "tpu" else "tokens"
        )
        to_q = DenseW(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = DenseW(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = DenseW(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = DenseW(c, dtype=self.dtype, name="to_out")
        residual = None
        if pre_norm is not None:
            from mmgt_tpu.ops.motion_attention import (
                motion_attention,
                use_motion_kernel,
            )
            from mmgt_tpu.ops.norms import layer_norm

            scale_p, bias_p, eps = pre_norm
            if (
                self.fuse_kernel
                and inner == c
                and use_motion_kernel(l, f, c, self.heads)
            ):
                wq, _ = to_q(x, return_weights=True)
                wk, _ = to_k(x, return_weights=True)
                wv, _ = to_v(x, return_weights=True)
                wo, bo = to_out(
                    jnp.zeros((1, 1, 1, inner), x.dtype), return_weights=True
                )
                return motion_attention(
                    x, scale_p, bias_p, pe, wq, wk, wv, wo, bo,
                    self.heads, eps,
                )
            residual = x
            x = layer_norm(x, scale_p, bias_p, eps)
            x = x + pe[None, :, None, :].astype(x.dtype)
        if layout == "lanes":
            h, d = self.heads, self.head_dim
            xd = x.astype(self.dtype)
            wq, _ = to_q(x, return_weights=True)
            wk, _ = to_k(x, return_weights=True)
            wv, _ = to_v(x, return_weights=True)
            wo, bo = to_out(jnp.zeros((1, 1, 1, inner), x.dtype),
                            return_weights=True)
            proj = lambda w: jnp.einsum(
                "chd,bflc->hdbfl", w.reshape(c, h, d), xd
            )
            q, k, v = proj(wq), proj(wk), proj(wv)
            # multiply in compute dtype, ACCUMULATE f32 (dtype=) — keeps
            # the projections writing bf16 (an f32 astype here would fuse
            # backward into them, doubling their HBM writes) while the
            # softmax still sees f32 sums; scale after the reduce, exact
            # in f32. Tradeoff: individual q*k products round to bf16
            # before accumulation (~bf16-eps logit noise, measured 1-2
            # output ulp); the fused kernel (ops.motion_attention), which
            # serves every kernel-eligible shape, keeps exact f32
            # products since its operands never leave VMEM.
            logits = jnp.sum(
                q[:, :, :, :, None] * k[:, :, :, None],
                axis=1,
                dtype=jnp.float32,
            )  # (H, B, F, G, L)
            probs = jax.nn.softmax(logits / math.sqrt(d), axis=3)
            o = jnp.sum(
                probs[:, None].astype(v.dtype) * v[:, :, :, None], axis=4
            )  # (H, D, B, F, L)
            out = jnp.einsum("hdbfl,hdo->bflo", o, wo.reshape(h, d, c))
            out = out + bo.astype(out.dtype)
            return out if residual is None else residual + out
        q, k, v = to_q(x), to_k(x), to_v(x)
        hsplit = lambda t: t.reshape(b, f, l, self.heads, self.head_dim)
        q, k, v = hsplit(q), hsplit(k), hsplit(v)
        qf = q.astype(jnp.float32) / math.sqrt(self.head_dim)
        kf = k.astype(jnp.float32)
        logits = jnp.sum(
            qf[:, :, None] * kf[:, None], axis=-1
        )  # (B, F, G, L, H)
        probs = jax.nn.softmax(logits, axis=2)
        o = jnp.sum(
            probs[..., None].astype(v.dtype) * v[:, None], axis=2
        )  # (B, F, L, H, D)
        o = o.reshape(b, f, l, inner)
        out = to_out(o)
        return out if residual is None else residual + out


class TemporalTransformerBlock(nn.Module):
    """Two temporal self-attentions + ff over (B, F, L, C) tokens.

    `fuse_kernels=False` (training: the UNet passes `not remat`) keeps
    the plain XLA composition: the fused paths' recompute-based VJPs
    nest inside nn.remat's own recompute (double recompute, measured
    +18 ms on the full-size train step), while at inference the kernels
    are a pure win."""

    heads: int
    head_dim: int
    max_len: int = 32
    dtype: jnp.dtype = jnp.float32
    fuse_kernels: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, f, l, c = x.shape
        pe = sinusoidal_positions(self.max_len, c)[:f]
        for i in range(2):
            pn = LayerNorm(name=f"norm_{i}", params_only=True)(x)
            # norm + PE + attention + residual fuse into one Pallas kernel
            # on TPU (ops.motion_attention)
            x = TemporalAttention(
                self.heads, self.head_dim, dtype=self.dtype,
                fuse_kernel=self.fuse_kernels, name=f"attn_{i}",
            )(x, pre_norm=(*pn, 1e-5), pe=pe)
        pnf = LayerNorm(name="ff_norm", params_only=True)(x)
        ff = FeedForward(dtype=self.dtype, name="ff")
        if not self.fuse_kernels:
            from mmgt_tpu.ops.norms import layer_norm

            return x + ff(layer_norm(x, *pnf, 1e-5))
        # ff norm goes through the fused LN->GEGLU path over (B, F*L, C)
        # tokens: a standalone LN here materializes in whatever layout the
        # GEGLU dot prefers (a transposed 315 MB write at the flagship
        # level-0 shape, measured); the pallas kernel reads c-minor
        x2 = x.reshape(b, f * l, c)
        x2 = x2 + ff(x2, pre_norm=(*pnf, 1e-5))
        return x2.reshape(b, f, l, c)


class MotionModule(nn.Module):
    """AnimateDiff-style temporal transformer over the frame axis.

    Input (N=B*F, H, W, C); attention runs over frames at every spatial
    location, batched over (B, L) without layout transposes. proj_out is
    zero-initialized so a fresh module is an identity (reference
    motion_module.py:72-74). num_transformer_block=1 with two
    Temporal_Self attentions per the shipped config (animation.yaml:61-69).
    """

    heads: int = 8
    max_len: int = 32
    dtype: jnp.dtype = jnp.float32
    fuse_kernels: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, video_length: int):
        n, h, w, c = x.shape
        b = n // video_length
        residual = x
        t = GroupNorm(32, 1e-6, name="norm")(x)
        tokens = t.reshape(b, video_length, h * w, c)
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_in")(tokens)
        tokens = TemporalTransformerBlock(
            self.heads, c // self.heads, self.max_len, self.dtype,
            self.fuse_kernels, name="block",
        )(tokens)
        tokens = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(tokens)
        return residual + tokens.reshape(n, h, w, c)
