import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.models.smga import (
    NFEATS,
    GestureDecoder,
    apply_rotary,
    face_body_split,
)
from mmgt_tpu.training.adan import adan
from mmgt_tpu.training.stage1 import SMGA, transform_if_no_negative


def test_face_body_split():
    x = jnp.ones((1, 2, NFEATS))
    face, body = face_body_split(x)
    assert float(face[..., 72:276].sum()) == 2 * (276 - 72)
    assert float(face[..., :72].sum()) == 0
    assert float(body[..., 72:276].sum()) == 0
    np.testing.assert_allclose(np.asarray(face + body), np.asarray(x))


def test_rotary_matches_reference_lib():
    """Compare against the vendored rotary-embedding-torch formula."""
    torch = pytest.importorskip("torch")
    d, n = 8, 5
    x = np.random.default_rng(0).standard_normal((1, n, d)).astype(np.float32)
    # reference formula: freqs = 1/theta^(2i/d); interleaved rotate_half
    freqs = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    ang = np.arange(n)[:, None] * freqs[None, :]
    ang = np.repeat(ang, 2, axis=-1)
    x2 = x.reshape(1, n, d // 2, 2)
    rot = np.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(1, n, d)
    expected = x * np.cos(ang) + rot * np.sin(ang)
    out = apply_rotary(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_gesture_decoder_shapes_and_cfg():
    model = GestureDecoder(seq_len=16, latent_dim=64, ff_size=128,
                           num_layers=2, num_heads=4, cond_feature_dim=35)
    rng = jax.random.PRNGKey(0)
    b, T = 2, 16
    x = jnp.zeros((b, T, NFEATS))
    cf = jnp.zeros((b, NFEATS))
    cond = jnp.zeros((b, T, 35))
    t = jnp.zeros((b,), jnp.int32)
    params = model.init(rng, x, cf, cond, t)
    out = model.apply(params, x, cf, cond, t)
    assert out.shape == (b, T, NFEATS)
    # cond dropout changes the output (null embeddings differ from cond)
    out_keep = model.apply(params, x, cf, cond, t, jnp.ones((b,), bool))
    out_drop = model.apply(params, x, cf, cond, t, jnp.zeros((b,), bool))
    assert float(jnp.max(jnp.abs(out_keep - out_drop))) > 1e-6
    # guided_forward with weight 1 == conditional forward
    g = model.apply(params, x, cf, cond, t, 1.0,
                    method=GestureDecoder.guided_forward)
    np.testing.assert_allclose(np.asarray(g), np.asarray(out_keep), atol=1e-5)


def test_adan_matches_torch_reference():
    """One-param trajectory must match the reference torch Adan."""
    torch = pytest.importorskip("torch")

    # --- torch reference (reimplemented update rule, adan.py:9-121)
    lr, wd, eps = 1e-2, 0.02, 1e-8
    b1, b2, b3 = 0.02, 0.08, 0.01
    p = torch.tensor([1.0, -2.0, 3.0], dtype=torch.float64)
    m = torch.zeros(3, dtype=torch.float64)
    v = torch.zeros(3, dtype=torch.float64)
    n = torch.zeros(3, dtype=torch.float64)
    prev = torch.zeros(3, dtype=torch.float64)
    traj = []
    for step1 in range(1, 4):
        g = p * 0.5 + 0.1  # deterministic pseudo-grad
        if step1 > 1:
            m = m * (1 - b1) + b1 * g
            gd = g - prev
            v = v * (1 - b2) + b2 * gd
            n = n * (1 - b3) + b3 * (g + (1 - b2) * gd) ** 2
        cm = 1 / (1 - (1 - b1) ** step1)
        cv = 1 / (1 - (1 - b2) ** step1)
        cn = 1 / (1 - (1 - b3) ** step1)
        ss = lr / ((n * cn).sqrt() + eps)
        p = (p - ss * (m * cm + (1 - b2) * v * cv)) / (1 + wd * lr)
        prev = g.clone()
        traj.append(p.clone().numpy())

    # --- our optax adan
    tx = adan(lr, (b1, b2, b3), eps, wd)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0], jnp.float64)}
    state = tx.init(params)
    for step1 in range(1, 4):
        grads = {"w": params["w"] * 0.5 + 0.1}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p_, u: p_ + u, params, updates)
        # jax side runs f32 (x64 disabled) -> f32-level agreement
        np.testing.assert_allclose(
            np.asarray(params["w"]), traj[step1 - 1], rtol=2e-6
        )


def test_transform_if_no_negative():
    x = jnp.asarray([[0.2, 0.8]])
    np.testing.assert_allclose(
        np.asarray(transform_if_no_negative(x)), [[-0.6, 0.6]], atol=1e-6
    )
    y = jnp.asarray([[-0.5, 0.8]])
    np.testing.assert_allclose(
        np.asarray(transform_if_no_negative(y)), np.asarray(y)
    )


@pytest.mark.slow
def test_smga_train_and_sample():
    smga = SMGA(feature_type="baseline")
    smga.horizon = 16
    smga.__post_init__()
    rng = jax.random.PRNGKey(0)
    state = smga.init_state(rng, batch_size=2)
    batch = {
        "keypoints": jnp.clip(
            jnp.asarray(
                np.random.default_rng(0).random((2, 16, NFEATS)), jnp.float32
            ),
            0,
            1,
        ),
        "cond_frame": jnp.zeros((2, NFEATS)),
        "audio_features": jnp.zeros((2, 16, 35)),
    }
    step = jax.jit(smga.train_step)
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if l0 is None:
            l0 = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
    # ema drifted from params
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(a - b))),
            state.params,
            state.ema_params,
        ),
    )
    assert delta > 0

    out = jax.jit(lambda p, r: smga.sample(
        p, r, batch["cond_frame"], batch["audio_features"], 10
    ))(state.ema_params, rng)
    assert out.shape == (2, 16, NFEATS)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= -1.0 and o.max() <= 1.0
