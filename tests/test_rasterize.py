import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.data.conditioning import (
    denormalize_keypoints,
    mask_leg,
    normalize_keypoints,
    prepare_conditioning_from_keypoints,
)
from mmgt_tpu.data.rasterize import rasterize_clip, rasterize_frame
from mmgt_tpu.ops.image import gaussian_blur, mask_pyramid, normalize_minmax


def _synthetic_kpts(t=2):
    """Plausible standing figure, normalized coords, all visible."""
    rng = np.random.default_rng(0)
    k = np.zeros((t, 134, 3), np.float32)
    k[..., 2] = 1.0
    # body: head top-center, limbs spread
    base = np.array([0.5, 0.2])
    k[:, :18, :2] = base + rng.uniform(-0.15, 0.3, (18, 2)).astype(np.float32)
    # face cluster
    k[:, 24:92, :2] = np.array([0.5, 0.18]) + rng.uniform(
        -0.05, 0.05, (68, 2)
    ).astype(np.float32)
    # hands
    k[:, 92:113, :2] = np.array([0.3, 0.55]) + rng.uniform(
        -0.04, 0.04, (21, 2)
    ).astype(np.float32)
    k[:, 113:134, :2] = np.array([0.7, 0.55]) + rng.uniform(
        -0.04, 0.04, (21, 2)
    ).astype(np.float32)
    return jnp.asarray(k)


def test_rasterize_frame_outputs():
    k = _synthetic_kpts(1)[0]
    out = rasterize_frame(k, 128, 128)
    assert out["pose"].shape == (128, 128, 3)
    assert float(out["pose"].max()) <= 1.0 and float(out["pose"].max()) > 0.1
    # masks are binary and non-empty
    for name in ("face_mask", "lips_mask", "hands_mask"):
        m = np.asarray(out[name])
        assert m.shape == (128, 128)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        assert m.sum() > 0, name
    # face mask includes hand bboxes (reference: face = face_bbox + hands)
    f, h = np.asarray(out["face_mask"]), np.asarray(out["hands_mask"])
    assert (f >= h).all()


def test_rasterize_invisible_empty():
    k = jnp.zeros((134, 3))  # score 0 -> nothing visible
    out = rasterize_frame(k, 64, 64)
    assert float(out["pose"].sum()) == 0.0
    assert float(out["face_mask"].sum()) == 0.0


def test_rasterize_clip_chunked():
    k = _synthetic_kpts(4)
    out = rasterize_clip(k, 64, 64, chunk=2)
    assert out["pose"].shape == (4, 64, 64, 3)
    # frames identical keypoints -> identical render
    np.testing.assert_allclose(
        np.asarray(out["pose"][0]), np.asarray(out["pose"][1])
    )


def test_keypoint_normalization_roundtrip():
    kp = jnp.asarray([[0.0, 512.0, 800.0, -200.0]])
    np.testing.assert_allclose(
        np.asarray(denormalize_keypoints(normalize_keypoints(kp))), np.asarray(kp),
        atol=1e-4,
    )


def test_mask_leg():
    kp = jnp.ones((1, 402))
    out = np.asarray(mask_leg(kp)).reshape(134, 3)
    assert out[9:11].sum() == 0 and out[12:14].sum() == 0
    assert out[0:9].sum() == 9 * 3


def test_gaussian_blur_preserves_mean_and_smooths():
    x = jnp.zeros((16, 16)).at[8, 8].set(1.0)
    y = gaussian_blur(x, 5)
    assert float(y[8, 8]) < 1.0 and float(y[7, 8]) > 0.0
    np.testing.assert_allclose(float(y.sum()), 1.0, rtol=1e-4)


def test_mask_pyramid_shapes():
    m = jnp.ones((2, 64, 64))
    pyr = mask_pyramid(m, 4)
    assert [p.shape for p in pyr] == [(2, 4096), (2, 1024), (2, 256), (2, 64)]


def test_prepare_conditioning_from_keypoints():
    k = np.array(_synthetic_kpts(2))  # copy; scale only xy to absolute coords
    k[..., :2] *= 512
    out = prepare_conditioning_from_keypoints(jnp.asarray(k.reshape(2, 402)))
    assert out["pose_video"].shape == (1, 2, 512, 512, 3)
    assert len(out["masks"]) == 3
    full0, face0, lip0 = out["masks"][0]
    assert full0.shape == (1, 2, 4096)
    assert float(face0.max()) <= 1.0 and float(face0.max()) > 0.0
    # full mask is high where face mask is low (background)
    f = np.asarray(face0).reshape(2, 64, 64)
    fu = np.asarray(full0).reshape(2, 64, 64)
    assert fu[0, 0, 0] > 0.9  # far corner: background
