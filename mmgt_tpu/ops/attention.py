"""Attention ops: Pallas TPU flash-attention kernel + XLA fallback.

This replaces the reference's xformers/torch SDPA usage
(reference: train_stage_2.py:564-571, diffusers Attention modules) with a
TPU-native flash attention. All attention in the framework (spatial self,
reference-augmented self, CLIP/audio cross, temporal) goes through
`dot_product_attention`.

Layout convention: (batch, num_heads, seq, head_dim) — "BHSD".
Softmax and accumulation are always float32 regardless of input dtype.

`kv_lens` (per-batch-row valid KV length) supports variable-length KV in a
single batched call — used for classifier-free-guidance where the uncond
half must NOT attend to the reference-bank tokens appended at the end of
KV (reference mutual_self_attention.py:168-188), and for training-time
reference dropout. Fully-masked KV blocks are skipped inside the kernel,
so uncond rows pay no extra FLOPs for the bank.

The Pallas kernel is a streaming-softmax ("flash") pass over KV chunks
with a grid over (batch*heads, q_chunks). Head dims are zero-padded to a
multiple of 128 lanes outside the kernel.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Mosaic's default scoped-VMEM limit is 16 MB; the VAE mid-attention shape
# (4096 tokens x d=512 single-head, batch 8) needs ~18 MB of stack for its
# full-KV blocks. v5e has 128 MB VMEM — raise the per-kernel limit.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _xla_attention(q, k, v, scale, kv_lens=None):
    """Reference implementation (used on CPU and for testing)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_lens is not None:
        col = jnp.arange(k.shape[2])
        mask = col[None, None, None, :] < kv_lens[:, None, None, None]
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (q_block, full KV) flash-attention pass.

    kvlen_ref: (B*H, 1) int32 in SMEM (whole array, indexed by program id);
    q_ref: (1, BQ, D); k/v_ref: (1, KV, D).
    """
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    kv_pad = k_ref.shape[1]
    kv_len = kvlen_ref[pl.program_id(0), 0]
    num_kv_blocks = pl.cdiv(kv_len, block_k)  # skip fully-masked blocks

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention(q, k, v, kv_lens, scale: float, block_q: int = 512,
                     block_k: int = 512, interpret: bool = False):
    b, h, sq, d = q.shape
    skv = k.shape[2]

    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))

    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, skv_pad, d_pad)
    vp = vp.reshape(b * h, skv_pad, d_pad)

    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, jnp.int32)
    lens_bh = jnp.repeat(kv_lens.astype(jnp.int32), h)[:, None]  # (B*H, 1)

    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (lens_bh.shape[0], 1), lambda bh, i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens_bh, qp, kp, vp)

    out = out.reshape(b, h, sq_pad, d_pad)
    return out[:, :, :sq, :d]


def dot_product_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_lens: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Attention over (B, S, H, D) tensors — the projection-native layout.

    Convenience wrapper so the hot spatial/cross attention call sites skip
    writing their own head transposes; also carries the exact single-KV-
    token shortcut (softmax over one key is identically 1 -> output is v).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if k.shape[1] == 1 and kv_lens is None:
        return jnp.broadcast_to(
            v, (q.shape[0], q.shape[1]) + v.shape[2:]
        ).astype(q.dtype)
    # Layout note: a "native-BSHD" scratch-accumulator kernel processing
    # heads via 40-lane slices was built and measured at 252 ms vs 132 ms
    # for the padded-BHSD kernel on the bank-attention shape (PERF.md r2) —
    # Mosaic's narrow-lane ops lose far more than the host-side
    # pad/transpose costs. So this wrapper simply routes through the
    # BHSD kernel.
    o = dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        scale,
        kv_lens,
        impl,
    )
    return o.transpose(0, 2, 1, 3)


# ------------------------------------------------------------ backward pass
def _flash_fwd_lse_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          block_k: int, scale: float):
    """Forward pass that also emits the per-row logsumexp (for the VJP)."""
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    kv_len = kvlen_ref[pl.program_id(0), 0]
    num_kv_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (BQ, 1)


def _flash_dq_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                     dq_ref, *, block_k: int, scale: float):
    """dq for one q block: dq_i = scale * sum_j p_ij (dp_ij - D_i) k_j."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]    # (BQ, 1)
    dsum = dsum_ref[0]  # (BQ, 1)
    bq, d = q.shape
    kv_len = kvlen_ref[pl.program_id(0), 0]
    num_kv_blocks = pl.cdiv(kv_len, block_k)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(
        0, num_kv_blocks, body, jnp.zeros((bq, d), jnp.float32)
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      dsum_ref, dk_ref, dv_ref, *, block_q: int, scale: float):
    """dk/dv for one kv block, looping over q blocks.

    dv_j = sum_i p_ij^T do_i ; dk_j = scale * sum_i (p_ij (dp_ij - D_i))^T q_i
    """
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        + pl.program_id(1) * bk
    )
    in_len = col < kv_len  # (1, BK) — masks this kv block's columns
    sq = q_ref.shape[1]
    num_q_blocks = sq // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]    # (BQ, 1)
        dsum = dsum_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(in_len, s, _NEG_INF)
        p = jnp.exp(s - lse)  # rows with padded lse produce exp(-inf)=0 via s
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    z = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_fwd_lse(q, k, v, kv_lens, scale: float,
                             block_q: int = 512, block_k: int = 512,
                             interpret: bool = False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, skv_pad, d_pad)
    vp = vp.reshape(b * h, skv_pad, d_pad)
    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, jnp.int32)
    lens_bh = jnp.repeat(kv_lens.astype(jnp.int32), h)[:, None]
    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_fwd_lse_kernel, block_k=block_k, scale=scale
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lens_bh.shape[0], 1), lambda bh, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens_bh, qp, kp, vp)
    o = o.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    return o, lse


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_bwd(q, k, v, kv_lens, lse, o, do, scale: float,
                         block_q: int = 512, block_k: int = 512,
                         interpret: bool = False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)))
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, skv_pad, d_pad)
    vp = vp.reshape(b * h, skv_pad, d_pad)
    dop = dop.reshape(b * h, sq_pad, d_pad)
    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, jnp.int32)
    lens_bh = jnp.repeat(kv_lens.astype(jnp.int32), h)[:, None]
    # D_i = rowsum(do * o) in f32 (padded rows -> 0)
    dsum = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(b * h, sq)
    dsum = jnp.pad(dsum, ((0, 0), (0, sq_pad - sq)))[:, :, None]
    # NOTE: padded q rows do NOT carry lse = 0 — the forward kernel gives
    # them lse = log(kv_len) (s = 0 over valid columns), so their p in the
    # dkv kernel is 1/kv_len, not 0. Their dk/dv contribution is neutralized
    # solely by do = 0 on those rows (hence dsum = 0 and p^T.do = 0). Do not
    # rely on lse alone to mask padded rows.
    common = [
        pl.BlockSpec((lens_bh.shape[0], 1), lambda *_: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=block_k, scale=scale),
        grid=(b * h, sq_pad // block_q),
        in_specs=common + [
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens_bh, qp, kp, vp, dop, lse, dsum)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_q=block_q, scale=scale),
        grid=(b * h, skv_pad // block_k),
        in_specs=common + [
            pl.BlockSpec((1, sq_pad, d_pad), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d_pad), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, 1), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, 1), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skv_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, skv_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens_bh, qp, kp, vp, dop, lse, dsum)
    dq = dq.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    dk = dk.reshape(b, h, skv_pad, d_pad)[:, :, :skv, :d]
    dv = dv.reshape(b, h, skv_pad, d_pad)[:, :, :skv, :d]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_diff(q, k, v, kv_lens, scale, interpret=False):
    return _flash_attention(q, k, v, kv_lens, scale, interpret=interpret)


def _flash_diff_fwd(q, k, v, kv_lens, scale, interpret):
    o, lse = _flash_attention_fwd_lse(
        q, k, v, kv_lens, scale, interpret=interpret
    )
    return o, (q, k, v, kv_lens, lse, o)


def _flash_diff_bwd(scale, interpret, res, do):
    q, k, v, kv_lens, lse, o = res
    dq, dk, dv = _flash_attention_bwd(
        q, k, v, kv_lens, lse, o, do, scale, interpret=interpret
    )
    dlens = (
        None
        if kv_lens is None
        else np.zeros(kv_lens.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, dlens


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


# ----------------------------------------------------- lane-packed attention
# The UNet's head_dim is 40 (320ch/8h) / 80 / 160 — not lane-aligned. The
# classic BHSD route costs, per denoising group (xplane trace, PERF.md r3):
# ~131 ms of d->128 pad ops, ~168 ms of layout copies, and forces the q/k/v
# projections into pathological {1,2,0} layouts that run at ~4% MXU
# (~12 ms each). The lane-packed route removes ALL of that: the projection
# WEIGHTS are scattered into per-head 128-lane slabs, so the projection
# matmul writes (B, S, H*slab) — already the flash kernel's operand layout.
# The kernel grid gains a head axis whose BlockSpec slices 128-aligned lane
# slabs (cheap in Mosaic; the 40-lane slicing that lost 2x in r2 was
# sub-lane-aligned). Padded lanes are exact zeros in q/k/v (zero weight
# columns), so logits and outputs are unchanged.
PACKED_MIN_SEQ = 512
FORCE_PACKED_INTERPRET = False  # tests: route through the packed kernel


def packed_slab(head_dim: int) -> int:
    return _round_up(head_dim, 128)


def packed_backend() -> bool:
    """True when this process routes long attention through the packed
    kernels (used by callers that precompute packed operands)."""
    return FORCE_PACKED_INTERPRET or jax.default_backend() == "tpu"


def use_packed_attention(lq: int, lk: int, head_dim: int) -> bool:
    """Static (trace-time) routing decision for the lane-packed path."""
    if FORCE_PACKED_INTERPRET:
        return True
    return (
        jax.default_backend() == "tpu"
        and lq >= PACKED_MIN_SEQ
        and lk >= PACKED_MIN_SEQ
        and head_dim % 128 != 0
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "slab", "block_q", "block_k", "interpret")
)
def _flash_attention_packed_fwd(q, k, v, kv_lens, scale: float, slab: int,
                                block_q: int = 512, block_k: int = 512,
                                interpret: bool = False):
    """q/k/v: (B, S, H*slab) lane-packed. Returns (o (B, Sq, H*slab),
    lse (B*H, Sq_pad, 1) f32 — the BHSD kernels' lse layout; Mosaic
    requires the last block dim be lane-aligned or the full dim, so the
    head lives in dim 0 via the index map). Reuses the standard flash
    kernel body — the head axis lives in the grid and the BlockSpec lane
    maps."""
    b, sq, hs = q.shape
    h = hs // slab
    skv = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        k = jnp.pad(k, ((0, 0), (0, skv_pad - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_pad - skv), (0, 0)))
    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, jnp.int32)
    lens = kv_lens.astype(jnp.int32)[:, None]

    grid = (b, h, sq_pad // block_q)
    o, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb, hh, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, slab), lambda bb, hh, i: (bb, i, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, slab), lambda bb, hh, i: (bb, 0, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, slab), lambda bb, hh, i: (bb, 0, hh),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, slab), lambda bb, hh, i: (bb, i, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1),
                         lambda bb, hh, i, h=h: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, h * slab), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * slab,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens, q, k, v)
    return o[:, :sq], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def packed_attention(q, k, v, kv_lens, scale: float, slab: int, d_real: int):
    """Differentiable lane-packed flash attention over (B, S, H*slab).

    Lanes d_real..slab of every head slab must be zero in q/k/v (they are,
    when projected with slab-packed weights); the output carries zeros
    there too."""
    o, _ = _flash_attention_packed_fwd(
        q, k, v, kv_lens, scale, slab, interpret=FORCE_PACKED_INTERPRET
    )
    return o


def _packed_diff_fwd(q, k, v, kv_lens, scale, slab, d_real):
    o, lse = _flash_attention_packed_fwd(
        q, k, v, kv_lens, scale, slab, interpret=FORCE_PACKED_INTERPRET
    )
    return o, (q, k, v, kv_lens, lse, o)


def _packed_diff_bwd(scale, slab, d_real, res, do):
    """Backward via the existing BHSD kernels: unpack -> bwd -> repack.

    Training pays the unpack/repack transposes (comparable to the old
    pad/transpose chain); inference never runs this."""
    q, k, v, kv_lens, lse, o = res
    b, sq, hs = q.shape
    h = hs // slab
    skv = k.shape[1]

    def unpack(t, s_len):
        return t.reshape(b, s_len, h, slab)[..., :d_real].transpose(0, 2, 1, 3)

    qb, ob, dob = unpack(q, sq), unpack(o, sq), unpack(do, sq)
    kb, vb = unpack(k, skv), unpack(v, skv)
    # lse is already in the BHSD kernels' (b*h, sq_pad, 1) layout
    dq, dk, dv = _flash_attention_bwd(
        qb, kb, vb, kv_lens, lse, ob, dob, scale,
        interpret=FORCE_PACKED_INTERPRET,
    )

    def repack(g, s_len):
        z = jnp.zeros((b, s_len, h, slab), g.dtype)
        return z.at[..., :d_real].set(g.transpose(0, 2, 1, 3)).reshape(
            b, s_len, h * slab
        )

    dlens = (
        None
        if kv_lens is None
        else np.zeros(kv_lens.shape, jax.dtypes.float0)
    )
    return repack(dq, sq), repack(dk, skv), repack(dv, skv), dlens


packed_attention.defvjp(_packed_diff_fwd, _packed_diff_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_lens: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Full (non-causal) attention over BHSD tensors.

    kv_lens: optional (B,) int32 — per-row valid KV prefix length.
    impl: None (auto: pallas on TPU, xla elsewhere) | "pallas" | "xla".
    Differentiable on all paths: the pallas path carries a custom VJP with
    flash backward kernels (dq pass + dk/dv pass, recompute-based), so
    full-resolution training runs on TPU where XLA's materializing
    attention cannot (13-128 GB logits).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if k.shape[2] == 1 and kv_lens is None:
        # softmax over a single key is identically 1 -> output == v
        return jnp.broadcast_to(v, q.shape[:3] + (v.shape[-1],)).astype(q.dtype)
    if impl is None:
        # The flash kernel wins on long sequences (spatial/cross attention,
        # Skv >= 512). For short-seq huge-batch attention (temporal motion
        # attention: Skv = frames <= 32, batch = B*H*W) XLA's batched-matmul
        # softmax is both faster and avoids per-row SMEM length tables.
        long_seq = q.shape[2] >= 512 and k.shape[2] >= 512
        impl = (
            "pallas" if (jax.default_backend() == "tpu" and long_seq) else "xla"
        )
    if impl == "xla":
        return _xla_attention(q, k, v, scale, kv_lens)
    if impl == "pallas":
        return _flash_attention_diff(q, k, v, kv_lens, scale)
    if impl == "pallas_interpret":
        return _flash_attention_diff(q, k, v, kv_lens, scale, True)
    raise ValueError(f"unknown attention impl {impl!r}")


# ------------------------------------------- two-segment packed attention
# Reference-bank self-attention (mutual_self_attention.py:160-186) attends
# each query to [self tokens ; bank tokens]. The bank is a PER-GENERATION
# CONSTANT (the ReferenceNet runs once) and identical for every window/CFG
# row, yet the concat route re-projects and re-materializes it inside every
# denoising step. This kernel takes the bank K/V as separate batch-1
# operands: the grid iterates (head, batch, q-block) so the bank block's
# index map is constant across the whole batch — Pallas keeps it VMEM-
# resident and HBM reads it once per head instead of once per (row, head).
# Self K/V stay per-row; `kv_lens` keeps the reference's uc_mask semantics
# (rows with kv_len == l_self skip every bank block: masked-block skipping
# makes ungated rows pay no bank FLOPs).
def _flash_fwd_lse_2seg_kernel(kvlen_ref, q_ref, ks_ref, vs_ref, kb_ref,
                               vb_ref, o_ref, lse_ref, *, block_k: int,
                               scale: float, l_self: int):
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    kv_len = kvlen_ref[pl.program_id(1), 0]
    bank_len = jnp.maximum(kv_len - l_self, 0)

    def seg_body(k_seg_ref, v_seg_ref, valid_len):
        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_seg_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            v = v_seg_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
                + i * block_k
            )
            s = jnp.where(col < valid_len, s, _NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        return body

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    carry = jax.lax.fori_loop(
        0, pl.cdiv(l_self, block_k), seg_body(ks_ref, vs_ref, l_self),
        (acc0, m0, l0),
    )
    acc, m, l = jax.lax.fori_loop(
        0, pl.cdiv(bank_len, block_k), seg_body(kb_ref, vb_ref, bank_len),
        carry,
    )
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


@functools.partial(
    jax.jit, static_argnames=("scale", "slab", "block_q", "block_k", "interpret")
)
def _flash_attention_packed_2seg_fwd(q, ks, vs, kb, vb, kv_lens, scale: float,
                                     slab: int, block_q: int = 512,
                                     block_k: int = 512,
                                     interpret: bool = False):
    """q/ks/vs: (B, S, H*slab) lane-packed; kb/vb: (1, S_bank, H*slab).

    kv_lens (B,) is the TOTAL valid length per row (l_self, or
    l_self + l_bank for bank-gated rows) — the same semantics the concat
    route uses, so callers only switch operand plumbing."""
    b, sq, hs = q.shape
    h = hs // slab
    l_self, l_bank = ks.shape[1], kb.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(max(l_self, l_bank), 128))
    sq_pad = _round_up(sq, block_q)
    ls_pad = _round_up(l_self, block_k)
    lb_pad = _round_up(l_bank, block_k)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if ls_pad != l_self:
        ks = jnp.pad(ks, ((0, 0), (0, ls_pad - l_self), (0, 0)))
        vs = jnp.pad(vs, ((0, 0), (0, ls_pad - l_self), (0, 0)))
    if lb_pad != l_bank:
        kb = jnp.pad(kb, ((0, 0), (0, lb_pad - l_bank), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, lb_pad - l_bank), (0, 0)))
    if kv_lens is None:
        kv_lens = jnp.full((b,), l_self + l_bank, jnp.int32)
    lens = kv_lens.astype(jnp.int32)[:, None]

    grid = (h, b, sq_pad // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_lse_2seg_kernel, block_k=block_k, scale=scale,
            l_self=l_self,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda hh, bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, slab), lambda hh, bb, i: (bb, i, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ls_pad, slab), lambda hh, bb, i: (bb, 0, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ls_pad, slab), lambda hh, bb, i: (bb, 0, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lb_pad, slab), lambda hh, bb, i: (0, 0, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lb_pad, slab), lambda hh, bb, i: (0, 0, hh),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, slab), lambda hh, bb, i: (bb, i, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1),
                         lambda hh, bb, i, h=h: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, h * slab), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * (l_self + l_bank) * slab,
            bytes_accessed=(q.size + ks.size + vs.size) * q.dtype.itemsize
            + (kb.size + vb.size) * kb.dtype.itemsize * h,
            transcendentals=b * h * sq * (l_self + l_bank),
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(lens, q, ks, vs, kb, vb)
    return o[:, :sq], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def packed_attention_2seg(q, ks, vs, kb, vb, kv_lens, scale: float, slab: int,
                          d_real: int):
    """Differentiable two-segment lane-packed flash attention.

    Inference never differentiates this; the VJP concatenates the
    broadcast bank into the self segment and reuses the BHSD backward
    kernels (bank grads sum over the batch)."""
    o, _ = _flash_attention_packed_2seg_fwd(
        q, ks, vs, kb, vb, kv_lens, scale, slab,
        interpret=FORCE_PACKED_INTERPRET,
    )
    return o


def _packed_2seg_fwd(q, ks, vs, kb, vb, kv_lens, scale, slab, d_real):
    o, lse = _flash_attention_packed_2seg_fwd(
        q, ks, vs, kb, vb, kv_lens, scale, slab,
        interpret=FORCE_PACKED_INTERPRET,
    )
    return o, (q, ks, vs, kb, vb, kv_lens, lse, o)


def _packed_2seg_bwd(scale, slab, d_real, res, do):
    q, ks, vs, kb, vb, kv_lens, lse, o = res
    b, sq, hs = q.shape
    h = hs // slab
    l_self, l_bank = ks.shape[1], kb.shape[1]

    def unpack(t, s_len):
        return t.reshape(-1, s_len, h, slab)[..., :d_real].transpose(0, 2, 1, 3)

    kcat = jnp.concatenate([ks, jnp.broadcast_to(kb, (b, l_bank, hs))], 1)
    vcat = jnp.concatenate([vs, jnp.broadcast_to(vb, (b, l_bank, hs))], 1)
    lens_was_none = kv_lens is None
    if lens_was_none:
        kv_lens = jnp.full((b,), l_self + l_bank, jnp.int32)
    dq, dk, dv = _flash_attention_bwd(
        unpack(q, sq), unpack(kcat, l_self + l_bank), unpack(vcat, l_self + l_bank),
        kv_lens, lse, unpack(o, sq), unpack(do, sq), scale,
        interpret=FORCE_PACKED_INTERPRET,
    )

    def repack(g, s_len):
        z = jnp.zeros((g.shape[0], s_len, h, slab), g.dtype)
        return z.at[..., :d_real].set(g.transpose(0, 2, 1, 3)).reshape(
            g.shape[0], s_len, h * slab
        )

    dks, dkb = dk[:, :, :l_self], dk[:, :, l_self:].sum(0, keepdims=True)
    dvs, dvb = dv[:, :, :l_self], dv[:, :, l_self:].sum(0, keepdims=True)
    dlens = (
        None if lens_was_none else np.zeros(kv_lens.shape, jax.dtypes.float0)
    )
    return (
        repack(dq, sq), repack(dks, l_self), repack(dvs, l_self),
        repack(dkb, l_bank), repack(dvb, l_bank), dlens,
    )


packed_attention_2seg.defvjp(_packed_2seg_fwd, _packed_2seg_bwd)
