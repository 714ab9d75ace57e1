"""Fused motion-module (temporal) attention — Pallas, TPU.

One kernel computes, per motion-module attention (reference
src/models/motion_module.py:135-262: LayerNorm -> +sinusoidal PE ->
frame-axis MHA -> residual):

    out = x + to_out( attn_frames( LN(x)*g+b + pe ) )

reading each (frame, token-block, C) tile of x from HBM exactly once and
writing only the residual-added output. The XLA lowering of the same math
(see models/blocks.TemporalAttention) makes ~6 HBM round trips per
attention: the normalized tensor, q/k/v, the (F, F)-pair logits, the
probs and the attention output are all materialized. At the flagship
level-0 shape each of those is 189-315 MB.

In-kernel layout: the projections run as `dot_general(W, h)` contracting
on both operands' C axes, so q/k/v land TRANSPOSED as (inner, F*BL) with
the 128-aligned token axis on lanes. Per-head slices are then sublane
slices (head_dim is a multiple of 8), per-frame slices are 128-aligned
lane slices, and the F x F logits/probs/weighted-sum run on the VPU at
full lane utilization with zero head-dim padding — the same trick as the
"lanes" XLA formulation, but without any intermediate leaving VMEM.

Numerics: LN statistics and softmax in f32; q/k stay in the projection
dots' f32 accumulation so the logits multiply-reduce runs on EXACT f32
products (VPU lanes are 32-bit — keeping them f32 costs only VMEM; the
XLA "lanes" fallback in models/blocks.py instead multiplies in bf16 to
keep the projections writing bf16 to HBM, a documented tradeoff); the
probs @ v sum accumulates bf16 products in f32. The custom VJP
recomputes the plain-XLA composition, so training is exact without a
handwritten backward kernel (same pattern as ops.fused_ln).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

FORCE_MOTION_INTERPRET = False  # tests: run the kernel in interpret mode


def use_motion_kernel(l: int, f: int, c: int, heads: int) -> bool:
    """Trace-time routing: token count must be lane-sliceable and the
    head_dim sublane-sliceable."""
    d = c // heads
    ok = l % 128 == 0 and d % 8 == 0 and c == heads * d and f >= 2
    if FORCE_MOTION_INTERPRET:
        return ok
    return ok and jax.default_backend() == "tpu"


def _motion_kernel(gb_ref, pe_ref, x_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                   bo_ref, o_ref, *, heads: int, eps: float):
    f, bl, c = x_ref.shape[1:]
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    cdt = x_ref.dtype

    x = x_ref[0]                                   # (F, BL, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    g = gb_ref[0][None, None, :]
    b = gb_ref[1][None, None, :]
    h = xc * jax.lax.rsqrt(var + eps) * g + b + pe_ref[...][:, None, :]
    h2 = h.reshape(f * bl, c).astype(cdt)          # merge major dims

    # transposed projections: (C, inner) x (F*BL, C) -> (inner, F*BL).
    # q/k keep the dot's f32 accumulation (exact logits products on the
    # 32-bit VPU lanes); v rounds to the compute dtype for the PV sum.
    tproj = lambda w_ref: jax.lax.dot_general(
        w_ref[...], h2, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qt, kt = tproj(wq_ref), tproj(wk_ref)
    vt = tproj(wv_ref).astype(cdt)

    o_rows = []
    for hh in range(heads):
        r0 = hh * d
        # (F, D, BL): sublane slice per head, 128-aligned lane slice/frame
        sl = lambda t: jnp.stack(
            [t[r0 : r0 + d, fi * bl : (fi + 1) * bl] for fi in range(f)]
        )
        qs, ks, vs = sl(qt), sl(kt), sl(vt)
        logits = jnp.sum(
            qs[:, None] * ks[None], axis=2, dtype=jnp.float32
        )  # (Fq, Fk, BL)
        logits = logits * scale
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_h = jnp.sum(
            p[:, :, None, :].astype(cdt) * vs[None], axis=1,
            dtype=jnp.float32,
        ).astype(cdt)                               # (F, D, BL)
        o_rows.append(
            jnp.concatenate([o_h[fi] for fi in range(f)], axis=1)
        )                                           # (D, F*BL)
    o_t = jnp.concatenate(o_rows, axis=0)           # (inner, F*BL)

    out2 = jax.lax.dot_general(
        o_t, wo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (F*BL, C)
    out2 = out2 + bo_ref[...]                       # (1, C) f32 bias row
    o_ref[0] = (
        x.astype(jnp.float32) + out2.reshape(f, bl, c)
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "eps", "block_l", "interpret")
)
def _motion_fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads: int,
                eps: float, block_l: int = 256, interpret: bool = False):
    b, f, l, c = x.shape
    cap = min(block_l, l)
    if c >= 1280:
        # bound the per-head (F, F, D, BL) product temporaries in VMEM
        cap = min(cap, 128)
    # largest multiple of 128 that divides l (l % 128 == 0 is gated)
    bl = 128
    for cand in range(cap, 127, -128):
        if l % cand == 0:
            bl = cand
            break
    assert l % bl == 0 and bl % 128 == 0, (l, bl)
    gb = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    bo_row = bo.astype(jnp.float32)[None, :]
    grid = (b, l // bl)
    wspec = lambda w: pl.BlockSpec(
        w.shape, lambda bb, i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_motion_kernel, heads=heads, eps=eps),
        grid=grid,
        in_specs=[
            wspec(gb),
            wspec(pe),
            pl.BlockSpec((1, f, bl, c), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            wspec(wq), wspec(wk), wspec(wv), wspec(wo), wspec(bo_row),
        ],
        out_specs=pl.BlockSpec((1, f, bl, c), lambda bb, i: (bb, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, l, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * f * c * c * 4 + 4 * b * l * f * f * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * l * f * f * heads,
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(gb, pe, x, wq, wk, wv, wo, bo_row)
    return out


def motion_ref(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads: int,
               eps: float = 1e-5):
    """Plain-XLA reference composition (used by the VJP and by tests):
    x + to_out(attn_frames(LN(x) + pe)) in the lane-major formulation."""
    b, f, l, c = x.shape
    d = c // heads
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32
    )
    h = (h + pe.astype(jnp.float32)[None, :, None, :]).astype(cdt)
    proj = lambda w: jnp.einsum(
        "chd,bflc->hdbfl", w.astype(cdt).reshape(c, heads, d), h
    )
    q, k, v = proj(wq), proj(wk), proj(wv)
    logits = jnp.sum(
        q[:, :, :, :, None] * k[:, :, :, None], axis=1, dtype=jnp.float32
    )
    probs = jax.nn.softmax(logits / math.sqrt(d), axis=3)
    o = jnp.sum(
        probs[:, None].astype(cdt) * v[:, :, :, None], axis=4,
        dtype=jnp.float32,
    ).astype(cdt)                                    # (H, D, B, F, L)
    out = jnp.einsum(
        "hdbfl,hdo->bflo", o, wo.astype(cdt).reshape(heads, d, c)
    )
    return x + out + bo.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def motion_attention(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads: int,
                     eps: float = 1e-5):
    """Fused x + to_out(attn_frames(LN(x)*gamma+beta + pe)).

    x: (B, F, L, C); pe: (F, C); wq/wk/wv: (C, C); wo: (C, C); bo: (C,).
    L must be a multiple of 128 and C/heads a multiple of 8
    (`use_motion_kernel` gates call sites).
    """
    return _motion_fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, eps,
                       interpret=FORCE_MOTION_INTERPRET)


def _motion_vjp_fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, eps):
    out = _motion_fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, eps,
                      interpret=FORCE_MOTION_INTERPRET)
    return out, (x, gamma, beta, pe, wq, wk, wv, wo, bo)


def _motion_vjp_bwd(heads, eps, res, g):
    x, gamma, beta, pe, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: motion_ref(*a, heads=heads, eps=eps),
        x, gamma, beta, pe, wq, wk, wv, wo, bo,
    )
    return vjp(g)


motion_attention.defvjp(_motion_vjp_fwd, _motion_vjp_bwd)
