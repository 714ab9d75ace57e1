import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.models.audio_proj import AudioProjModel
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D

TINY = dict(block_out_channels=(32, 64, 128, 128), heads=4)


def _masks(b, f, h, w):
    out = []
    for lvl in range(3):
        l = (h >> lvl) * (w >> lvl)
        trio = tuple(jnp.ones((b, f, l), jnp.float32) for _ in range(3))
        out.append(trio)
    return out


def test_reference_unet_banks():
    model = ReferenceUNet2D(**TINY)
    rng = jax.random.PRNGKey(0)
    latent = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 1, 768))
    params = model.init(rng, latent, jnp.zeros((2,), jnp.int32), ctx)
    out, banks = model.apply(params, latent, jnp.zeros((2,), jnp.int32), ctx)
    assert out.shape == latent.shape
    assert len(banks) == 16
    # down banks: 2 per cross-attn block at full/half/quarter res
    assert banks[0].shape == (2, 64, 32)
    assert banks[2].shape == (2, 16, 64)
    assert banks[4].shape == (2, 4, 128)
    # mid
    assert banks[6].shape == (2, 1, 128)  # 8/8=1 -> (1x1)
    # first up cross-attn block (quarter res, 128ch)
    assert banks[7].shape == (2, 4, 128)
    # last up block (full res, 32ch)
    assert banks[-1].shape == (2, 64, 32)


def test_denoising_unet3d_forward():
    b, f, h, w = 2, 2, 8, 8
    ref = ReferenceUNet2D(**TINY)
    den = DenoisingUNet3D(**TINY)
    rng = jax.random.PRNGKey(0)
    latent2d = jnp.zeros((b, h, w, 4))
    ctx = jnp.zeros((b, 1, 768))
    ref_params = ref.init(rng, latent2d, jnp.zeros((b,), jnp.int32), ctx)
    _, banks = ref.apply(ref_params, latent2d, jnp.zeros((b,), jnp.int32), ctx)

    latents = jnp.zeros((b, f, h, w, 4))
    audio = jnp.zeros((b, f, 32, 768))
    pose = jnp.zeros((b, f, h, w, 32))
    masks = _masks(b, f, h, w)
    t = jnp.zeros((b,), jnp.int32)
    params = den.init(rng, latents, t, ctx, audio, pose, masks, banks)
    out = den.apply(params, latents, t, ctx, audio, pose, masks, banks)
    assert out.shape == latents.shape
    assert bool(jnp.isfinite(out).all())


def test_denoising_unet3d_zero_init_identity_modules():
    """Motion proj_out and audio zero-convs start at zero, so a fresh
    denoiser must produce identical outputs with/without audio+motion
    conditioning changes (audio tokens only enter via zero convs)."""
    b, f, h, w = 1, 2, 8, 8
    den = DenoisingUNet3D(**TINY)
    rng = jax.random.PRNGKey(1)
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, f, h, w, 4)), jnp.float32
    )
    ctx = jnp.zeros((b, 1, 768))
    masks = _masks(b, f, h, w)
    t = jnp.full((b,), 10, jnp.int32)
    audio0 = jnp.zeros((b, f, 32, 768))
    audio1 = jnp.ones((b, f, 32, 768))
    params = den.init(rng, latents, t, ctx, audio0, None, masks, None)
    out0 = den.apply(params, latents, t, ctx, audio0, None, masks, None)
    out1 = den.apply(params, latents, t, ctx, audio1, None, masks, None)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)


def test_cfg_uncond_ignores_bank():
    """With n_uncond=1, the uncond row's output must not depend on banks."""
    b, f, h, w = 2, 2, 8, 8
    ref = ReferenceUNet2D(**TINY)
    den = DenoisingUNet3D(**TINY)
    rng = jax.random.PRNGKey(2)
    latent2d = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, h, w, 4)), jnp.float32
    )
    ctx = jnp.zeros((b, 1, 768))
    ref_params = ref.init(rng, latent2d, jnp.zeros((b,), jnp.int32), ctx)
    _, banks = ref.apply(ref_params, latent2d, jnp.zeros((b,), jnp.int32), ctx)
    banks2 = [bk + 100.0 for bk in banks]

    latents = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, f, h, w, 4)), jnp.float32
    )
    t = jnp.full((b,), 10, jnp.int32)
    params = den.init(rng, latents, t, ctx, None, None, None, banks, n_uncond=1)
    o1 = den.apply(params, latents, t, ctx, None, None, None, banks, n_uncond=1)
    o2 = den.apply(params, latents, t, ctx, None, None, None, banks2, n_uncond=1)
    # uncond row identical, cond row different
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-5)
    assert float(jnp.max(jnp.abs(o1[1] - o2[1]))) > 1e-4


def test_pose_guider():
    pg = PoseGuider(embedding_channels=32, block_out_channels=(4, 8, 8, 16))
    rng = jax.random.PRNGKey(0)
    pose = jnp.ones((1, 2, 64, 64, 3))
    params = pg.init(rng, pose)
    out = pg.apply(params, pose)
    assert out.shape == (1, 2, 8, 8, 32)
    # conv_out zero-init -> output zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_audio_proj():
    ap = AudioProjModel()
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 3, 5, 12, 768))
    params = ap.init(rng, x)
    out = ap.apply(params, x)
    assert out.shape == (1, 3, 32, 768)


def _perturb(params, seed, scale=0.05):
    """Add noise to every param so zero-initialized modules are active."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )


def test_audio_block_uncond_skip_matches_full_compute():
    """n_uncond_rows>0 computes the uncond audio branch in closed form;
    with zeroed uncond audio tokens it must equal the full-batch path."""
    from mmgt_tpu.models.blocks import AudioTransformerBlock

    rng = np.random.default_rng(7)
    n, nu, l, c = 4, 2, 64, 80
    x = jnp.asarray(rng.standard_normal((n, l, c)), jnp.float32) * 0.3
    audio = jnp.asarray(rng.standard_normal((n, 32, 768)), jnp.float32) * 0.3
    audio = audio.at[:nu].set(0.0)
    masks = tuple(
        jnp.asarray(rng.uniform(0, 1, (n, l)) > 0.5, jnp.float32)
        for _ in range(3)
    )
    blk = AudioTransformerBlock(heads=2, head_dim=40)
    params = _perturb(blk.init(jax.random.PRNGKey(3), x, audio, masks), 11)
    full = blk.apply(params, x, audio, masks, (1.0, 2.0, 3.0))
    skip = blk.apply(params, x, audio, masks, (1.0, 2.0, 3.0), nu)
    np.testing.assert_allclose(
        np.asarray(skip), np.asarray(full), atol=2e-5, rtol=1e-4
    )


def test_unet3d_uncond_audio_skip_matches_full_compute():
    """UNet-level: n_uncond with zeroed uncond audio row equals n_uncond=0
    (banks=None so n_uncond changes nothing but the audio route)."""
    b, f, h, w = 2, 2, 8, 8
    den = DenoisingUNet3D(**TINY)
    rng = jax.random.PRNGKey(5)
    latents = jnp.asarray(
        np.random.default_rng(8).standard_normal((b, f, h, w, 4)), jnp.float32
    )
    ctx = jnp.zeros((b, 1, 768))
    audio = jnp.asarray(
        np.random.default_rng(9).standard_normal((b, f, 32, 768)), jnp.float32
    )
    audio = audio.at[:1].set(0.0)
    masks = _masks(b, f, h, w)
    t = jnp.full((b,), 10, jnp.int32)
    params = _perturb(
        den.init(rng, latents, t, ctx, audio, None, masks, None), 13
    )
    full = den.apply(params, latents, t, ctx, audio, None, masks, None)
    skip = den.apply(
        params, latents, t, ctx, audio, None, masks, None, n_uncond=1
    )
    np.testing.assert_allclose(
        np.asarray(skip), np.asarray(full), atol=3e-5, rtol=1e-4
    )


def test_temporal_attention_lanes_layout_matches_tokens():
    """The lane-major (H,D,B,F,L) temporal-attention formulation must be
    numerically equivalent to the token-major path (same math, different
    contraction/layout order)."""
    from mmgt_tpu.models import blocks as B

    rng = np.random.default_rng(21)
    b, f, l, c = 2, 4, 64, 32
    x = jnp.asarray(rng.standard_normal((b, f, l, c)), jnp.float32) * 0.5
    attn = B.TemporalAttention(heads=4, head_dim=8)
    old = B.FORCE_TEMPORAL_LAYOUT
    try:
        B.FORCE_TEMPORAL_LAYOUT = "tokens"
        params = attn.init(jax.random.PRNGKey(0), x)
        tok = attn.apply(params, x)
        B.FORCE_TEMPORAL_LAYOUT = "lanes"
        lan = attn.apply(params, x)
    finally:
        B.FORCE_TEMPORAL_LAYOUT = old
    np.testing.assert_allclose(
        np.asarray(lan), np.asarray(tok), atol=2e-5, rtol=1e-4
    )
    # and it is differentiable (training path)
    B.FORCE_TEMPORAL_LAYOUT = "lanes"
    try:
        g = jax.grad(lambda p: jnp.sum(attn.apply(p, x) ** 2))(params)
        assert all(bool(jnp.isfinite(a).all()) for a in jax.tree.leaves(g))
    finally:
        B.FORCE_TEMPORAL_LAYOUT = old
