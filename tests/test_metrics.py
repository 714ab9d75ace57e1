"""Inference-quality metric sanity (utils/metrics.py): identity fixed
points, monotone degradation under noise, and closed-form PSNR."""
import numpy as np
import pytest

from mmgt_tpu.utils import metrics as M


@pytest.fixture(scope="module")
def video():
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (4, 64, 64, 3))
    return np.clip(base, 0, 1)


def test_psnr_identity_and_closed_form(video):
    assert M.psnr(video, video) == float("inf")
    noisy = np.clip(video + 0.1, 0, 1)  # uniform +0.1 clipped
    err = noisy - video
    want = 10 * np.log10(1.0 / np.mean(err**2))
    np.testing.assert_allclose(M.psnr(noisy, video), want, rtol=1e-6)


def test_psnr_monotone_in_noise(video):
    rng = np.random.default_rng(1)
    n = rng.normal(0, 1, video.shape)
    a = M.psnr(np.clip(video + 0.01 * n, 0, 1), video)
    b = M.psnr(np.clip(video + 0.05 * n, 0, 1), video)
    assert a > b > 0


def test_ssim_identity_and_range(video):
    s = M.ssim(video, video)
    np.testing.assert_allclose(s, 1.0, atol=1e-9)
    rng = np.random.default_rng(2)
    s1 = M.ssim(np.clip(video + 0.02 * rng.normal(size=video.shape), 0, 1), video)
    s2 = M.ssim(np.clip(video + 0.2 * rng.normal(size=video.shape), 0, 1), video)
    assert 1.0 > s1 > s2 > -1.0


def test_temporal_flicker():
    static = np.full((5, 16, 16, 3), 0.5)
    assert M.temporal_flicker(static) == 0.0
    rng = np.random.default_rng(3)
    noisy = static + 0.1 * rng.normal(size=static.shape)
    calm = static + 0.01 * rng.normal(size=static.shape)
    assert M.temporal_flicker(noisy) > M.temporal_flicker(calm) > 0.0
    assert M.temporal_flicker(static[:1]) == 0.0  # single frame


@pytest.mark.slow
def test_clip_identity_drift_zero_for_identical():
    import jax
    import jax.numpy as jnp

    from mmgt_tpu.models.clip_vision import CLIPVisionModel

    model = CLIPVisionModel()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    rng = np.random.default_rng(4)
    frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    d_same = M.clip_identity_drift(frames, frames, model, params)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    other = np.clip(frames + 0.3 * rng.normal(size=frames.shape), 0, 1).astype(
        np.float32
    )
    assert M.clip_identity_drift(frames, other, model, params) > d_same
