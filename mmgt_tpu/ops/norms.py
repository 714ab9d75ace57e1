"""Normalization ops.

Channel-last (NHWC / N...C) layout throughout — the TPU-preferred layout.
GroupNorm reductions run in float32 regardless of input dtype.

On TPU, GroupNorm runs as a single-pass Pallas kernel when one batch row
fits VMEM: XLA's lowering costs ~2 full HBM passes (a convert+reduce
fusion for the statistics, then a normalize fusion); the kernel loads each
(spatial, C) row once, computes the f32 group statistics in-VMEM via an
MXU column-sum, and writes the normalized (+SiLU) output — ~2x less HBM
traffic on the UNet's 60+ GroupNorms (measured via xplane traces, PERF.md).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
               eps: float, act: Optional[str], use_gram: bool):
    """One batch row: x_ref (1, L, C). Group stats via MXU column-sums.

    Sum-of-squares per channel comes either from the diagonal of the Gram
    matrix x^T x (use_gram: no (L, C) f32 temporary — best when L >> C) or
    from a column-sum of a materialized f32 square (best when L is small).
    Both accumulate bf16 products in f32, matching XLA's convert-then-
    reduce statistics bit-for-bit up to summation order.
    """
    xb = x_ref[0]                               # (L, C), input dtype
    l, c = xb.shape
    gs = c // num_groups
    ones = jnp.ones((8, l), xb.dtype)           # 8 rows: MXU-friendly LHS
    colsum = jax.lax.dot_general(
        ones, xb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:1]                                       # (1, C)
    if use_gram:
        gram = jax.lax.dot_general(
            xb, xb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # (C, C)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        )
        colsq = jnp.sum(
            jnp.where(eye, gram, 0.0), axis=0, keepdims=True
        )                                       # (1, C)
    else:
        x2 = jnp.square(xb.astype(jnp.float32))
        colsq = jax.lax.dot_general(
            jnp.ones((8, l), jnp.float32), x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]
    # channel->group reduction and group->channel broadcast as tiny MXU
    # dots against a 0/1 membership matrix (Mosaic disallows the lane-dim
    # reshape (C,) -> (G, C/G))
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)                                     # (C, G)
    gsum = jax.lax.dot_general(
        colsum, gmask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                         # (1, G)
    gsq = jax.lax.dot_general(
        colsq, gmask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n = jnp.float32(l * gs)
    mean_g = gsum / n
    var_g = jnp.maximum(gsq / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    back = lambda t: jax.lax.dot_general(
        t, gmask, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                         # (1, C)
    mean_c = back(mean_g)
    inv_c = back(inv_g)
    out = (xb.astype(jnp.float32) - mean_c) * inv_c
    out = out * scale_ref[0][None, :] + bias_ref[0][None, :]
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _gn_kernel_blocked(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *,
                       num_groups: int, eps: float, act: Optional[str],
                       row_n: int):
    """Blocked two-phase GroupNorm for rows too large for VMEM.

    Grid (N, 2, NB) — TPU grids run SEQUENTIALLY on the core, so phase 0
    accumulates per-channel sum/sum-of-squares over the row's blocks into
    a persistent f32 scratch, and phase 1 revisits the same blocks to
    normalize. HBM traffic = 2 reads + 1 write of x (the XLA lowering of
    the VAE-decoder 512^2 shapes measured ~26x off that floor)."""
    ph = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((ph == 0) & (i == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0]                                   # (BL, C)
    bl, c = xb.shape

    @pl.when(ph == 0)
    def _accumulate():
        ones = jnp.ones((8, bl), xb.dtype)
        colsum = jax.lax.dot_general(
            ones, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]                                       # (1, C)
        x2 = jnp.square(xb.astype(jnp.float32))
        colsq = jax.lax.dot_general(
            jnp.ones((8, bl), jnp.float32), x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]
        acc_ref[0:1] += colsum
        acc_ref[1:2] += colsq

    @pl.when(ph == 1)
    def _normalize():
        gs = c // num_groups
        gmask = (
            jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
            == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        ).astype(jnp.float32)                       # (C, G)
        gdot = lambda t: jax.lax.dot_general(
            t, gmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gsum = gdot(acc_ref[0:1])                   # (1, G)
        gsq = gdot(acc_ref[1:2])
        n = jnp.float32(row_n * gs)
        mean_g = gsum / n
        var_g = jnp.maximum(gsq / n - mean_g * mean_g, 0.0)
        inv_g = jax.lax.rsqrt(var_g + eps)
        back = lambda t: jax.lax.dot_general(
            t, gmask, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (1, C)
        out = (xb.astype(jnp.float32) - back(mean_g)) * back(inv_g)
        out = out * scale_ref[0][None, :] + bias_ref[0][None, :]
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "block_l",
                              "interpret")
)
def _group_norm_pallas_blocked(x, scale, bias, num_groups: int, eps: float,
                               act: Optional[str], block_l: int,
                               interpret: bool = False):
    n = x.shape[0]
    c = x.shape[-1]
    l = 1
    for s in x.shape[1:-1]:
        l *= s
    x2 = x.reshape(n, l, c)
    nb = l // block_l
    kernel = functools.partial(
        _gn_kernel_blocked, num_groups=num_groups, eps=eps, act=act, row_n=l
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, 2, nb),
        in_specs=[
            # phase 0 streams blocks for stats; phase 1 re-streams them
            pl.BlockSpec((1, block_l, c), lambda nn, ph, i: (nn, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda nn, ph, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda nn, ph, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # phase 0 parks the (unwritten) out buffer on block 0 so only
        # phase 1's writes produce traffic
        out_specs=pl.BlockSpec(
            (1, block_l, c), lambda nn, ph, i: (nn, i * ph, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * n * l * c,
            bytes_accessed=3 * x2.size * x2.dtype.itemsize,
            transcendentals=n * l * c if act else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32))
    return out.reshape(x.shape)


def _gn_blocked_block_l(l: int, c: int) -> int:
    """Largest block length that divides l AND is a multiple of 8,
    bounded so a double-buffered in+out block pair stays well under
    VMEM. Returns 0 when l admits no such block (callers must reject)."""
    cap = max(8, (8 * 1024 * 1024) // max(c * 4, 1) // 8 * 8)
    start = min(cap, l) // 8 * 8
    for cand in range(start, 7, -8):
        if l % cand == 0:
            return cand
    return 0


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "interpret")
)
def _group_norm_pallas(x, scale, bias, num_groups: int, eps: float,
                       act: Optional[str], interpret: bool = False):
    n = x.shape[0]
    c = x.shape[-1]
    l = 1
    for s in x.shape[1:-1]:
        l *= s
    x2 = x.reshape(n, l, c)
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, act=act,
        use_gram=(2 * c < l),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        # one (L, C) row + f32 temporaries exceeds the default 16M scoped
        # VMEM at the 4096x320 level-0 shape; v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32))
    return out.reshape(x.shape)


def _gn_auto_impl(x, num_groups: int, scale, bias) -> str:
    """Pick the GroupNorm lowering: single-pass row kernel when a batch
    row fits VMEM, the blocked two-phase kernel for big rows (the VAE's
    512^2 activations), XLA otherwise."""
    if jax.default_backend() != "tpu" or scale is None or bias is None:
        return "xla"
    if x.ndim < 3:
        return "xla"
    c = x.shape[-1]
    l = 1
    for s in x.shape[1:-1]:
        l *= s
    if c % num_groups != 0 or l < 8:
        return "xla"
    # VMEM estimate: double-buffered in/out row blocks + f32 temporaries
    # (validated against the raised 96M per-kernel limit set below)
    io = l * c * x.dtype.itemsize * 4
    tmp = c * c * 8 if 2 * c < l else l * c * 4
    if io + tmp + l * c * 4 <= 64 * 1024 * 1024:
        return "pallas"
    # big rows (VAE 512^2 activations) stay on XLA: the blocked two-phase
    # kernel below wins per-GN (5.3 vs 13.1 ms stats at (8,512^2,256),
    # traced) but LOSES program-level — XLA fuses the normalize+silu into
    # the following conv's input, and forfeiting that fusion costs more than
    # the stats pass saves (VAE decode chunk 174 -> 199 ms, measured).
    # "pallas_blocked" remains available as an explicit impl.
    return "xla"


def _group_norm_xla(x, num_groups, scale, bias, eps, act):
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm_pallas_diff(x, scale, bias, num_groups, eps, act, interpret):
    return _group_norm_pallas(x, scale, bias, num_groups, eps, act,
                              interpret=interpret)


def _gn_diff_fwd(x, scale, bias, num_groups, eps, act, interpret):
    out = _group_norm_pallas(x, scale, bias, num_groups, eps, act,
                             interpret=interpret)
    return out, (x, scale, bias)


def _gn_diff_bwd(num_groups, eps, act, interpret, res, g):
    # recompute-based backward through the (numerically equal) XLA math —
    # the fwd pallas kernel saves only its inputs
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_xla(x_, num_groups, s_, b_, eps, act),
        x, scale, bias,
    )
    return vjp(g)


_group_norm_pallas_diff.defvjp(_gn_diff_fwd, _gn_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _group_norm_blocked_diff(x, scale, bias, num_groups, eps, act, block_l,
                             interpret):
    return _group_norm_pallas_blocked(x, scale, bias, num_groups, eps, act,
                                      block_l, interpret=interpret)


def _gn_blocked_fwd(x, scale, bias, num_groups, eps, act, block_l, interpret):
    out = _group_norm_pallas_blocked(x, scale, bias, num_groups, eps, act,
                                     block_l, interpret=interpret)
    return out, (x, scale, bias)


def _gn_blocked_bwd(num_groups, eps, act, block_l, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_xla(x_, num_groups, s_, b_, eps, act),
        x, scale, bias,
    )
    return vjp(g)


_group_norm_blocked_diff.defvjp(_gn_blocked_fwd, _gn_blocked_bwd)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    act: Optional[str] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """GroupNorm over the trailing channel dim of an N...C tensor.

    Statistics are computed over (all spatial dims, channels-in-group) per
    leading batch dim — equivalent to torch GroupNorm on NCHW after layout
    transposition (used by every ResNet/transformer block in the reference's
    UNets). Optional fused activation: "silu".

    impl: None (auto: single-pass pallas row kernel on TPU when a batch
    row fits VMEM, the blocked two-phase pallas kernel for big rows, else
    XLA) | "pallas" | "pallas_interpret" | "pallas_blocked" |
    "pallas_blocked_interpret" | "xla".
    Differentiable on all paths (the pallas paths carry a recompute-based
    custom VJP through the XLA math).
    """
    if impl is None:
        impl = _gn_auto_impl(x, num_groups, scale, bias)
    if impl in ("pallas", "pallas_interpret"):
        return _group_norm_pallas_diff(
            x, scale, bias, num_groups, eps, act, impl == "pallas_interpret"
        )
    if impl in ("pallas_blocked", "pallas_blocked_interpret"):
        l = 1
        for s in x.shape[1:-1]:
            l *= s
        block_l = _gn_blocked_block_l(l, x.shape[-1])
        if block_l == 0:
            raise ValueError(
                f"impl={impl!r}: row length {l} has no multiple-of-8 "
                f"divisor <= the VMEM cap; use impl='xla'"
            )
        return _group_norm_blocked_diff(
            x, scale, bias, num_groups, eps, act, block_l,
            impl == "pallas_blocked_interpret",
        )
    return _group_norm_xla(x, num_groups, scale, bias, eps, act)


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
