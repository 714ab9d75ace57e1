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
