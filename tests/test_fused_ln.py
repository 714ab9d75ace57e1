"""Fused LayerNorm->projections kernel (ops/fused_ln.py).

Validates the Pallas kernel (interpret mode on CPU) against the plain
layer_norm + matmul composition it replaces, including the recompute VJP.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.ops import fused_ln
from mmgt_tpu.ops.norms import layer_norm


def _ref(x, gamma, beta, ws, bs, eps=1e-5):
    xn = layer_norm(x, gamma, beta, eps)
    return tuple((xn @ w + b.astype(xn.dtype)).astype(x.dtype)
                 for w, b in zip(ws, bs))


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(fused_ln, "FORCE_FUSED_INTERPRET", True)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n_proj", [1, 3])
def test_matches_unfused(dtype, n_proj):
    rng = np.random.default_rng(0)
    b, l, c, d = 2, 96, 64, 40
    x = jnp.asarray(rng.standard_normal((b, l, c)), dtype)
    gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ws = tuple(jnp.asarray(rng.standard_normal((c, d)), dtype) for _ in range(n_proj))
    bs = tuple(jnp.asarray(rng.standard_normal(d), jnp.float32) for _ in range(n_proj))
    outs = fused_ln.ln_projections(x, gamma, beta, ws, bs, 1e-5)
    refs = _ref(x, gamma, beta, ws, bs)
    assert len(outs) == n_proj
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    for o, r in zip(outs, refs):
        assert o.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32), atol=tol, rtol=tol
        )


def test_ragged_length_padding():
    """l not a multiple of the block: padded rows must not leak."""
    rng = np.random.default_rng(1)
    b, l, c, d = 1, 37, 32, 16
    x = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
    gamma, beta = jnp.ones(c), jnp.zeros(c)
    w = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    (o,) = fused_ln.ln_projections(x, gamma, beta, (w,), (bias,), 1e-5)
    (r,) = _ref(x, gamma, beta, (w,), (bias,))
    assert o.shape == (b, l, d)
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5, rtol=1e-5)


def test_vjp_matches_composition():
    rng = np.random.default_rng(2)
    b, l, c, d = 2, 64, 48, 24
    x = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ws = tuple(jnp.asarray(rng.standard_normal((c, d)), jnp.float32) for _ in range(2))
    bs = tuple(jnp.asarray(rng.standard_normal(d), jnp.float32) for _ in range(2))

    def loss_fused(x, gamma, beta, ws, bs):
        outs = fused_ln.ln_projections(x, gamma, beta, ws, bs, 1e-5)
        return sum(jnp.sum(o**2) for o in outs)

    def loss_ref(x, gamma, beta, ws, bs):
        outs = _ref(x, gamma, beta, ws, bs)
        return sum(jnp.sum(o**2) for o in outs)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, ws, bs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, ws, bs)
    for a, b_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# block-level: fused (packed + LN-fused, interpret) == plain CPU composition
# ---------------------------------------------------------------------------
def _temporal_block_out(x, bank, gate, params, force, monkeypatch):
    from mmgt_tpu.models.blocks import TemporalBasicTransformerBlock
    from mmgt_tpu.ops import attention as A

    monkeypatch.setattr(fused_ln, "FORCE_FUSED_INTERPRET", force)
    monkeypatch.setattr(A, "FORCE_PACKED_INTERPRET", force)
    blk = TemporalBasicTransformerBlock(heads=2, head_dim=40)
    ctx = jnp.zeros((x.shape[0], 1, 768))
    if params is None:
        params = blk.init(jax.random.PRNGKey(0), x, ctx, bank, 2, gate)
    out = blk.apply(params, x, ctx, bank, 2, gate)
    return params, out


def test_temporal_block_fused_matches_plain(monkeypatch):
    rng = np.random.default_rng(3)
    b, f, l, c = 2, 2, 512, 80
    x = jnp.asarray(rng.standard_normal((b * f, l, c)), jnp.float32) * 0.3
    bank = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32) * 0.3
    gate = jnp.asarray([0, 1], jnp.int32)
    params, plain = _temporal_block_out(x, bank, gate, None, False, monkeypatch)
    _, fused = _temporal_block_out(x, bank, gate, params, True, monkeypatch)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=2e-4, rtol=2e-3
    )


def test_audio_block_fused_matches_plain(monkeypatch):
    from mmgt_tpu.models.blocks import AudioTransformerBlock
    from mmgt_tpu.ops import attention as A

    rng = np.random.default_rng(4)
    n, l, c = 2, 512, 80
    x = jnp.asarray(rng.standard_normal((n, l, c)), jnp.float32) * 0.3
    audio = jnp.asarray(rng.standard_normal((n, 32, 768)), jnp.float32) * 0.3
    masks = tuple(
        jnp.asarray(rng.uniform(0, 1, (n, l)) > 0.5, jnp.float32) for _ in range(3)
    )
    blk = AudioTransformerBlock(heads=2, head_dim=40)
    params = blk.init(jax.random.PRNGKey(1), x, audio, masks)
    plain = blk.apply(params, x, audio, masks)
    monkeypatch.setattr(fused_ln, "FORCE_FUSED_INTERPRET", True)
    monkeypatch.setattr(A, "FORCE_PACKED_INTERPRET", True)
    fused = blk.apply(params, x, audio, masks)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=2e-4, rtol=2e-3
    )
