import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.ops.attention import _xla_attention, dot_product_attention
from mmgt_tpu.ops.norms import group_norm, layer_norm


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype
    )


@pytest.mark.parametrize(
    "b,h,sq,skv,d",
    [
        (2, 8, 64, 64, 40),     # SD1.5 level-0 head dim
        (1, 8, 100, 228, 80),   # ragged seq + reference-concat KV
        (2, 4, 128, 32, 160),
    ],
)
def test_flash_attention_matches_xla(b, h, sq, skv, d):
    q = _rand((b, h, sq, d), 0)
    k = _rand((b, h, skv, d), 1)
    v = _rand((b, h, skv, d), 2)
    ref = _xla_attention(q, k, v, 1.0 / np.sqrt(d))
    out = dot_product_attention(q, k, v, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_attention_bf16():
    q = _rand((1, 2, 64, 64), 3, jnp.bfloat16)
    k = _rand((1, 2, 64, 64), 4, jnp.bfloat16)
    v = _rand((1, 2, 64, 64), 5, jnp.bfloat16)
    ref = _xla_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        1.0 / 8.0,
    )
    out = dot_product_attention(q, k, v, impl="pallas_interpret")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.03, rtol=0.05
    )


def test_group_norm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 6, 5, 32)).astype(np.float32)
    scale = np.random.default_rng(1).standard_normal(32).astype(np.float32)
    bias = np.random.default_rng(2).standard_normal(32).astype(np.float32)
    # torch GroupNorm works on NCHW
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(8, 32, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = gn(tx).permute(0, 2, 3, 1).numpy()
    out = group_norm(jnp.asarray(x), 8, jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_group_norm_fused_silu():
    x = _rand((2, 4, 4, 32), 0)
    base = group_norm(x, 4)
    fused = group_norm(x, 4, act="silu")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base * jax.nn.sigmoid(base)), atol=1e-5
    )


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(3).standard_normal((3, 7, 64)).astype(np.float32)
    ln = torch.nn.LayerNorm(64)
    with torch.no_grad():
        ln.weight.uniform_(-1, 1)
        ln.bias.uniform_(-1, 1)
        ref = ln(torch.from_numpy(x)).numpy()
    out = layer_norm(
        jnp.asarray(x),
        jnp.asarray(ln.weight.detach().numpy()),
        jnp.asarray(ln.bias.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_attention_kv_lens():
    """Rows with kv_lens=L must ignore KV tokens beyond L."""
    q = _rand((2, 2, 16, 32), 10)
    k = _rand((2, 2, 48, 32), 11)
    v = _rand((2, 2, 48, 32), 12)
    lens = jnp.asarray([16, 48], jnp.int32)
    out = dot_product_attention(q, k, v, kv_lens=lens, impl="xla")
    # row 0 == attention restricted to first 16 kv tokens
    ref0 = dot_product_attention(q[:1], k[:1, :, :16], v[:1, :, :16], impl="xla")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), atol=1e-5)
    # row 1 == full attention
    ref1 = dot_product_attention(q[1:], k[1:], v[1:], impl="xla")
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]), atol=1e-5)
    # pallas kernel agrees
    outp = dot_product_attention(q, k, v, kv_lens=lens, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(outp), np.asarray(out), atol=2e-5, rtol=1e-4)


def test_group_norm_pallas_matches_xla():
    """Single-pass pallas GroupNorm (interpret mode) == XLA reference."""
    import numpy as np

    from mmgt_tpu.ops.norms import group_norm

    rng = np.random.default_rng(0)
    for shape, g in [((3, 16, 16, 320), 32), ((2, 64, 1280), 32)]:
        x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, jnp.float32)
        sc = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        bi = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        for act in (None, "silu"):
            ref = group_norm(x, g, sc, bi, 1e-5, act, impl="xla")
            out = group_norm(x, g, sc, bi, 1e-5, act, impl="pallas_interpret")
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=3e-5,
                err_msg=f"{shape} act={act}",
            )


def test_flash_attention_backward_matches_xla():
    """Pallas flash-attention custom VJP (dq + dkv kernels) == XLA autodiff,
    including variable KV lengths — enables full-resolution TPU training
    where materializing attention cannot run."""
    import numpy as np

    from mmgt_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(0)
    b, h, sq, skv, d = 2, 3, 260, 390, 40
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)) * 0.5, jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    for lens in (None, jnp.asarray([390, 200], jnp.int32)):
        gp = jax.grad(
            lambda *a: jnp.sum(
                dot_product_attention(*a, kv_lens=lens, impl="pallas_interpret") * do
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        gx = jax.grad(
            lambda *a: jnp.sum(
                dot_product_attention(*a, kv_lens=lens, impl="xla") * do
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for name, a, b_ in zip(("dq", "dk", "dv"), gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-6,
                err_msg=f"{name} lens={lens}",
            )


def test_group_norm_pallas_backward_matches_xla():
    import numpy as np

    from mmgt_tpu.ops.norms import group_norm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 320)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(320), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(320), jnp.float32)
    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    for act in (None, "silu"):
        gp = jax.grad(
            lambda x_, s_, b_: jnp.sum(
                group_norm(x_, 32, s_, b_, 1e-5, act, "pallas_interpret") * g
            ),
            argnums=(0, 1, 2),
        )(x, sc, bi)
        gx = jax.grad(
            lambda x_, s_, b_: jnp.sum(
                group_norm(x_, 32, s_, b_, 1e-5, act, "xla") * g
            ),
            argnums=(0, 1, 2),
        )(x, sc, bi)
        for name, a, b_ in zip(("dx", "dscale", "dbias"), gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4,
                err_msg=f"{name} act={act}",
            )


def test_group_norm_blocked_matches_xla():
    """Two-phase blocked pallas GroupNorm (rows too big for VMEM)."""
    rng = np.random.default_rng(12)
    from mmgt_tpu.ops.norms import group_norm

    x = jnp.asarray(rng.standard_normal((2, 48, 8, 16)), jnp.float32)
    sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(16), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal(16), jnp.float32)
    for act in (None, "silu"):
        ref = group_norm(x, 4, sc, bi, 1e-5, act, impl="xla")
        out = group_norm(x, 4, sc, bi, 1e-5, act,
                         impl="pallas_blocked_interpret")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_group_norm_blocked_backward_matches_xla():
    rng = np.random.default_rng(13)
    from mmgt_tpu.ops.norms import group_norm

    x = jnp.asarray(rng.standard_normal((1, 64, 4, 8)), jnp.float32)
    sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(8), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal(8), jnp.float32)
    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss(impl):
        return lambda x_, s_, b_: jnp.sum(
            group_norm(x_, 4, s_, b_, 1e-5, "silu", impl) * g
        )

    got = jax.grad(loss("pallas_blocked_interpret"), argnums=(0, 1, 2))(
        x, sc, bi
    )
    want = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_group_norm_blocked_multiblock_accumulation():
    """Force several blocks per row so phase-0 scratch accumulation and
    the phase-1 revisit are actually exercised."""
    rng = np.random.default_rng(14)
    from mmgt_tpu.ops.norms import _group_norm_pallas_blocked, group_norm

    x = jnp.asarray(rng.standard_normal((2, 512, 16)), jnp.float32)
    sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(16), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal(16), jnp.float32)
    ref = group_norm(x, 4, sc, bi, 1e-5, "silu", impl="xla")
    out = _group_norm_pallas_blocked(
        x, sc, bi, 4, 1e-5, "silu", block_l=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
