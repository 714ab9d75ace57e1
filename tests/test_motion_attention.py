"""Fused motion-attention kernel (ops.motion_attention) vs plain XLA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.ops import motion_attention as MA


def _inputs(b=2, f=4, l=128, c=32, heads=4, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.3
    x = r(b, f, l, c)
    gamma = 1.0 + 0.1 * r(c)
    beta = 0.1 * r(c)
    pe = r(f, c)
    wq, wk, wv, wo = r(c, c), r(c, c), r(c, c), r(c, c)
    bo = 0.1 * r(c)
    return x, gamma, beta, pe, wq, wk, wv, wo, bo, heads


def test_motion_kernel_matches_ref(monkeypatch):
    monkeypatch.setattr(MA, "FORCE_MOTION_INTERPRET", True)
    args = _inputs()
    got = MA.motion_attention(*args)
    want = MA.motion_ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_motion_kernel_multi_tile_and_wide(monkeypatch):
    """l spanning several 128-blocks, head_dim 40 (the real UNet shape)."""
    monkeypatch.setattr(MA, "FORCE_MOTION_INTERPRET", True)
    args = _inputs(b=1, f=3, l=384, c=80, heads=2, seed=3)
    got = MA.motion_attention(*args)
    want = MA.motion_ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_motion_kernel_grad_matches_ref(monkeypatch):
    """The custom VJP (recompute via motion_ref) equals the reference
    gradient for every input."""
    monkeypatch.setattr(MA, "FORCE_MOTION_INTERPRET", True)
    args = _inputs(b=1, f=3, l=128, c=16, heads=2, seed=5)
    diff, heads = args[:-1], args[-1]

    f_kern = lambda *a: jnp.sum(MA.motion_attention(*a, heads) ** 2)
    f_ref = lambda *a: jnp.sum(MA.motion_ref(*a, heads) ** 2)
    g_kern = jax.grad(f_kern, argnums=tuple(range(9)))(*diff)
    g_ref = jax.grad(f_ref, argnums=tuple(range(9)))(*diff)
    for gk, gr in zip(g_kern, g_ref):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), atol=5e-5, rtol=1e-3
        )


def test_temporal_attention_module_routes_to_kernel(monkeypatch):
    """TemporalAttention(pre_norm=..., pe=...) through the kernel equals
    the composed XLA path (kernel disabled) — module-level equivalence."""
    from mmgt_tpu.models import blocks as B

    rng = np.random.default_rng(9)
    b, f, l, c = 2, 4, 128, 32
    x = jnp.asarray(rng.standard_normal((b, f, l, c)), jnp.float32) * 0.4
    pe = B.sinusoidal_positions(32, c)[:f]
    attn = B.TemporalAttention(heads=4, head_dim=8)

    def run(force_kernel):
        monkeypatch.setattr(MA, "FORCE_MOTION_INTERPRET", force_kernel)
        if force_kernel:
            use = MA.use_motion_kernel
        else:
            use = lambda *a: False
        monkeypatch.setattr(MA, "use_motion_kernel", use)
        params = attn.init(jax.random.PRNGKey(0), x)

        def fwd(p):
            def inner(mod, xx):
                pn = (jnp.ones((c,)), jnp.zeros((c,)), 1e-5)
                return mod(xx, pre_norm=pn, pe=pe)

            return attn.apply(p, x, method=lambda m, xx: inner(m, xx))

        return params, fwd(params)

    params, with_kernel = run(True)
    _, composed = run(False)
    np.testing.assert_allclose(
        np.asarray(with_kernel), np.asarray(composed), atol=2e-5, rtol=1e-4
    )


def test_use_motion_kernel_gating():
    assert not MA.use_motion_kernel(100, 4, 32, 4)  # l % 128 != 0
    assert not MA.use_motion_kernel(128, 4, 30, 4)  # d not sublane-aligned
    assert not MA.use_motion_kernel(128, 1, 32, 4)  # single frame
