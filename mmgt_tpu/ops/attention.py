"""Attention ops: Pallas TPU flash-attention kernel + XLA fallback.

This replaces the reference's xformers/torch SDPA usage
(reference: train_stage_2.py:564-571, diffusers Attention modules) with a
TPU-native flash attention. All attention in the framework (spatial self,
reference-augmented self, CLIP/audio cross, temporal) goes through
`dot_product_attention`.

Layout convention: (batch, num_heads, seq, head_dim) — "BHSD".
Softmax and accumulation are always float32 regardless of input dtype.

The Pallas kernel is a standard 2-pass-free streaming softmax ("flash")
over KV chunks with a grid over (batch*heads, q_chunks). Head dims are
zero-padded to a multiple of 128 lanes outside the kernel; KV sequence is
padded to the KV block size and masked inside the kernel with -inf scores.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _xla_attention(q, k, v, scale):
    """Reference implementation (used on CPU and for testing)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                  scale: float):
    """One (q_block, full KV) flash-attention pass.

    q_ref: (1, BQ, D), k_ref/v_ref: (1, KV_pad, D), o_ref: (1, BQ, D).
    """
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    kv_pad = k_ref.shape[1]
    num_kv_blocks = kv_pad // block_k

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
def _flash_attention(q, k, v, scale: float, block_q: int = 512,
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

    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, kv_len=skv, block_k=block_k, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
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
    )(qp, kp, vp)

    out = out.reshape(b, h, sq_pad, d_pad)
    return out[:, :, :sq, :d]


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Full (non-causal) attention over BHSD tensors.

    impl: None (auto: pallas on TPU, xla elsewhere) | "pallas" | "xla".
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    if impl == "pallas":
        return _flash_attention(q, k, v, scale)
    if impl == "pallas_interpret":
        return _flash_attention(q, k, v, scale, interpret=True)
    raise ValueError(f"unknown attention impl {impl!r}")
