"""Fused LayerNorm -> N projection matmuls (Pallas, TPU).

The transformer blocks' hot path is LN(x) followed by up to three
projections of the SAME normalized tensor (q/k/v, or the GEGLU input).
Unfused, x is read once for the statistics pass, the normalized tensor is
materialized (315 MB at the flagship level-0 shape), and each projection
reads it again. This kernel reads one x block into VMEM, computes the f32
row statistics on the VPU while the MXU runs the projection dots, and
writes only the projection outputs — the normalized tensor never touches
HBM.

Math is identical to `mmgt_tpu.ops.norms.layer_norm` (f32 statistics,
eps inside rsqrt) followed by `x_n @ w_i + b_i`; the custom VJP recomputes
that composition with plain XLA ops, so training is exact without a
handwritten backward kernel.

Replaces the reference's separate nn.LayerNorm + nn.Linear stacks
(src/models/attention.py:486-771) on the TPU inference path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ln_proj_kernel(gb_ref, x_ref, *w_b_out, eps: float, n_w: int):
    """One (1, block_l, C) x block: f32 LN stats -> n_w projection dots."""
    w_refs = w_b_out[:n_w]
    b_refs = w_b_out[n_w : 2 * n_w]
    out_refs = w_b_out[2 * n_w :]
    x = x_ref[0].astype(jnp.float32)          # (BL, C)
    g = gb_ref[0][None, :]                    # (1, C) f32
    b = gb_ref[1][None, :]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * g + b
    xn = xn.astype(w_refs[0].dtype)
    for i in range(n_w):
        acc = jax.lax.dot_general(
            xn, w_refs[i][...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_refs[i][0] = (acc + b_refs[i][...]).astype(out_refs[i].dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_l", "interpret")
)
def _ln_proj_fwd(x, gamma, beta, ws, bs, eps: float, block_l: int = 1024,
                 interpret: bool = False):
    b, l, c = x.shape
    block_l = min(block_l, _round_up(l, 8))
    l_pad = _round_up(l, block_l)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    gb = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    bias_rows = [bb.astype(jnp.float32)[None, :] for bb in bs]
    grid = (b, l_pad // block_l)
    in_specs = [
        pl.BlockSpec((2, c), lambda bb_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_l, c), lambda bb_, i: (bb_, i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda bb_, i: (0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ] + [
        pl.BlockSpec((1, w.shape[1]), lambda bb_, i: (0, 0),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    out_specs = [
        pl.BlockSpec((1, block_l, w.shape[1]), lambda bb_, i: (bb_, i, 0),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, l_pad, w.shape[1]), x.dtype) for w in ws
    ]
    outs = pl.pallas_call(
        functools.partial(_ln_proj_kernel, eps=eps, n_w=len(ws)),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(gb, x, *ws, *bias_rows)
    return tuple(o[:, :l] for o in outs)


def _ln_proj_ref(x, gamma, beta, ws, bs, eps):
    """Plain-XLA reference composition (used by the VJP and by tests)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    xn = xn.astype(x.dtype)
    return tuple(
        (xn @ w).astype(jnp.float32) + bb.astype(jnp.float32)
        for w, bb in zip(ws, bs)
    )


FORCE_FUSED_INTERPRET = False  # tests: run the kernel in interpret mode


def use_fused_ln(lq: int) -> bool:
    """Trace-time routing: the kernel pays off on long token sequences."""
    if FORCE_FUSED_INTERPRET:
        return True
    return jax.default_backend() == "tpu" and lq >= 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ln_projections(x, gamma, beta, ws: Tuple[jnp.ndarray, ...],
                   bs: Tuple[jnp.ndarray, ...], eps: float):
    """tuple(LN(x) @ w_i + b_i) with the LN fused into the projections.

    x: (B, L, C); gamma/beta: (C,); ws: tuple of (C, D_i); bs: (D_i,)
    (pass zeros for biasless projections). Outputs carry x.dtype.
    """
    return _ln_proj_fwd(x, gamma, beta, tuple(ws), tuple(bs), eps,
                        interpret=FORCE_FUSED_INTERPRET)


def _ln_projections_fwd(x, gamma, beta, ws, bs, eps):
    outs = _ln_proj_fwd(x, gamma, beta, tuple(ws), tuple(bs), eps,
                        interpret=FORCE_FUSED_INTERPRET)
    return outs, (x, gamma, beta, tuple(ws), tuple(bs))


def _ln_projections_bwd(eps, res, douts):
    x, gamma, beta, ws, bs = res

    def ref(x, g, b, ws, bs):
        outs = _ln_proj_ref(x, g, b, ws, bs, eps)
        return tuple(o.astype(x.dtype) for o in outs)

    _, vjp = jax.vjp(ref, x, gamma, beta, ws, bs)
    return vjp(tuple(douts))


ln_projections.defvjp(_ln_projections_fwd, _ln_projections_bwd)
