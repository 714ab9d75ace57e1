"""Lane-packed flash attention == reference XLA attention (math parity),
at the layer level (same checkpoint params drive both paths) and through
the custom VJP. Exercised via interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.ops import attention as A


def _pack(t, h, d, slab):
    b, s, _ = t.shape
    z = jnp.zeros((b, s, h, slab), t.dtype)
    z = z.at[..., :d].set(jnp.reshape(t, (b, s, h, d)))
    return z.reshape(b, s, h * slab)


@pytest.mark.parametrize("d,heads,lq,lk", [(40, 2, 512, 1024), (80, 2, 512, 512)])
def test_packed_kernel_matches_xla(d, heads, lq, lk):
    rng = np.random.default_rng(0)
    b, slab = 2, A.packed_slab(d)
    mk = lambda s: rng.standard_normal((b, s, heads * d)).astype(np.float32) * 0.3
    q, k, v = mk(lq), mk(lk), mk(lk)
    kv_lens = jnp.asarray([lk, lk - 200], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    bhsd = lambda t, s: jnp.asarray(t).reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    ref = A._xla_attention(bhsd(q, lq), bhsd(k, lk), bhsd(v, lk), scale, kv_lens)

    o, lse = A._flash_attention_packed_fwd(
        _pack(jnp.asarray(q), heads, d, slab),
        _pack(jnp.asarray(k), heads, d, slab),
        _pack(jnp.asarray(v), heads, d, slab),
        kv_lens, scale, slab, interpret=True,
    )
    got = np.asarray(o).reshape(b, lq, heads, slab)[..., :d].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5, rtol=2e-3)
    # padded lanes stay exactly zero
    assert np.abs(np.asarray(o).reshape(b, lq, heads, slab)[..., d:]).max() == 0.0
    assert np.isfinite(np.asarray(lse)).all()


def test_packed_attention_grads_match_xla():
    rng = np.random.default_rng(1)
    b, s, heads, d = 1, 512, 2, 40
    slab = A.packed_slab(d)
    scale = 1.0 / np.sqrt(d)
    q = rng.standard_normal((b, s, heads * d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, heads * d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, s, heads * d)).astype(np.float32) * 0.3

    prev = A.FORCE_PACKED_INTERPRET
    A.FORCE_PACKED_INTERPRET = True
    try:
        def loss_packed(q, k, v):
            o = A.packed_attention(
                _pack(q, heads, d, slab), _pack(k, heads, d, slab),
                _pack(v, heads, d, slab), None, scale, slab, d,
            )
            return jnp.sum(o**2)

        gq, gk, gv = jax.grad(loss_packed, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
    finally:
        A.FORCE_PACKED_INTERPRET = prev

    bhsd = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    def loss_ref(q, k, v):
        o = A._xla_attention(bhsd(q), bhsd(k), bhsd(v), scale, None)
        return jnp.sum(o**2)

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-4, rtol=5e-3)


def test_attention_layer_packed_path_matches_default():
    """Same params, same inputs: the packed routing and the default routing
    produce the same output (checkpoint-compatible by construction)."""
    from mmgt_tpu.nn.layers import Attention

    rng = np.random.default_rng(2)
    b, l, c, heads = 2, 512, 80, 2   # head_dim 40
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32) * 0.5)
    bank = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32) * 0.5)
    kv = jnp.concatenate([x, bank], axis=1)
    kv_lens = jnp.asarray([l, 2 * l], jnp.int32)

    attn = Attention(heads, c // heads)
    params = attn.init(jax.random.PRNGKey(0), x, kv, kv_lens)
    base = attn.apply(params, x, kv, kv_lens)

    prev = __import__("mmgt_tpu.ops.attention", fromlist=["x"]).FORCE_PACKED_INTERPRET
    import mmgt_tpu.ops.attention as AA

    AA.FORCE_PACKED_INTERPRET = True
    try:
        packed = attn.apply(params, x, kv, kv_lens)
        # init on the packed path yields the same param structure
        p2 = attn.init(jax.random.PRNGKey(0), x, kv, kv_lens)
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
        assert all(
            a.shape == b_.shape
            for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(params))
        )
    finally:
        AA.FORCE_PACKED_INTERPRET = prev
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(base), atol=2e-4, rtol=2e-3
    )


def test_two_segment_matches_concat():
    """2seg (self + batch-1 bank) == single-segment over the concat."""
    rng = np.random.default_rng(7)
    b, heads, d = 3, 2, 40
    slab = A.packed_slab(d)
    lq = ls = lb = 512
    scale = 1.0 / np.sqrt(d)
    mk = lambda bb, s: rng.standard_normal((bb, s, heads * d)).astype(np.float32) * 0.3
    q, ks, vs = mk(b, lq), mk(b, ls), mk(b, ls)
    kb, vb = mk(1, lb), mk(1, lb)
    # rows: ungated (self only), gated (self+bank), gated
    kv_lens = jnp.asarray([ls, ls + lb, ls + lb], jnp.int32)

    p = lambda t: _pack(jnp.asarray(t), heads, d, slab)
    o2, lse2 = A._flash_attention_packed_2seg_fwd(
        p(q), p(ks), p(vs), p(kb), p(vb), kv_lens, scale, slab, interpret=True
    )
    kcat = np.concatenate([ks, np.broadcast_to(kb, (b, lb, heads * d))], 1)
    vcat = np.concatenate([vs, np.broadcast_to(vb, (b, lb, heads * d))], 1)
    o1, lse1 = A._flash_attention_packed_fwd(
        p(q), p(kcat), p(vcat), kv_lens, scale, slab, interpret=True
    )
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lse2), np.asarray(lse1), atol=2e-5, rtol=2e-4)


def test_two_segment_grads_match_concat():
    rng = np.random.default_rng(8)
    b, heads, d = 2, 2, 40
    slab = A.packed_slab(d)
    lq = ls = lb = 512
    scale = 1.0 / np.sqrt(d)
    mk = lambda bb, s: rng.standard_normal((bb, s, heads * d)).astype(np.float32) * 0.3
    q, ks, vs = mk(b, lq), mk(b, ls), mk(b, ls)
    kb, vb = mk(1, lb), mk(1, lb)
    kv_lens = jnp.asarray([ls, ls + lb], jnp.int32)
    p = lambda t: _pack(jnp.asarray(t), heads, d, slab)

    prev = A.FORCE_PACKED_INTERPRET
    A.FORCE_PACKED_INTERPRET = True
    try:
        def loss2(q, ks, vs, kb, vb):
            o = A.packed_attention_2seg(
                p(q), p(ks), p(vs), p(kb), p(vb), kv_lens, scale, slab, d
            )
            return jnp.sum(o**2)

        def loss1(q, ks, vs, kb, vb):
            kcat = jnp.concatenate([ks, jnp.broadcast_to(kb, (b, lb, heads * d))], 1)
            vcat = jnp.concatenate([vs, jnp.broadcast_to(vb, (b, lb, heads * d))], 1)
            o = A.packed_attention(p(q), p(kcat), p(vcat), kv_lens, scale, slab, d)
            return jnp.sum(o**2)

        g2 = jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs),
            jnp.asarray(kb), jnp.asarray(vb),
        )
        g1 = jax.grad(loss1, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs),
            jnp.asarray(kb), jnp.asarray(vb),
        )
    finally:
        A.FORCE_PACKED_INTERPRET = prev
    for a, bb_ in zip(g2, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb_), atol=5e-4, rtol=5e-4
        )
