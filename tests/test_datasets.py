import json

import numpy as np
import pytest

from mmgt_tpu.data.datasets import GestureDataset, TalkingVideoDataset


def _make_stage1(tmp_path, n=4, t=80):
    (tmp_path / "keypoints").mkdir()
    (tmp_path / "baseline_feats").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        np.save(tmp_path / "keypoints" / f"c{i}.npy",
                rng.random((t, 402)).astype(np.float32))
        np.save(tmp_path / "baseline_feats" / f"c{i}.npy",
                rng.random((t, 35)).astype(np.float32))


def test_gesture_dataset(tmp_path):
    _make_stage1(tmp_path)
    ds = GestureDataset(str(tmp_path), "baseline")
    assert len(ds) == 4
    item = ds[0]
    assert item["keypoints"].shape == (80, 402)
    assert item["cond_frame"].shape == (402,)
    batch = next(ds.batches(2, seed=1))
    assert batch["keypoints"].shape == (2, 80, 402)
    assert batch["audio_features"].shape == (2, 80, 35)


def _make_record(path, t=30, size=64):
    rng = np.random.default_rng(1)
    h8 = size // 8
    np.savez(
        path,
        frames=rng.integers(0, 255, (t, size, size, 3), dtype=np.uint8),
        pose=rng.integers(0, 255, (t, size, size, 3), dtype=np.uint8),
        face_mask=rng.integers(0, 255, (t, h8, h8), dtype=np.uint8),
        lips_mask=rng.integers(0, 255, (t, h8, h8), dtype=np.uint8),
        hands_mask=np.zeros((t, h8, h8), dtype=np.uint8),
        audio_emb=rng.random((t, 12, 768)).astype(np.float16),
    )


def test_talking_video_dataset(tmp_path):
    recs = []
    for i in range(3):
        p = tmp_path / f"r{i}.npz"
        _make_record(p)
        recs.append({"record": str(p)})
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps(recs))

    ds = TalkingVideoDataset([str(meta)], n_sample_frames=12, audio_margin=2)
    assert len(ds) == 3
    rng = np.random.default_rng(0)
    item = ds.sample(0, rng)
    assert item["pixel_values"].shape == (12, 64, 64, 3)
    assert item["audio_embeds"].shape == (12, 5, 12, 768)
    assert item["ref_image"].shape == (64, 64, 3)
    assert len(item["masks"]) == 3
    assert item["masks"][0][0].shape == (12, 64)   # 8x8 base for 64px
    assert item["masks"][1][0].shape == (12, 16)
    # batching
    batch = next(ds.batches(2, seed=0))
    assert batch["pixel_values"].shape == (2, 12, 64, 64, 3)
    assert batch["masks"][0][1].shape == (2, 12, 64)
    # pixel range is [-1, 1]
    assert batch["pixel_values"].min() >= -1.0
    assert batch["pixel_values"].max() <= 1.0


def test_pyramid_resize_matches_jax_image_and_inference_path():
    """The dataset's antialiased-bilinear pyramid matches
    jax.image.resize("bilinear") — i.e. the on-device inference pyramid
    (ops/image.mask_pyramid) and the reference's PIL downscale — and the
    meanpool mode reproduces the r1 box average (VERDICT r1 item 7)."""
    import jax
    import jax.numpy as jnp

    from mmgt_tpu.data.datasets import _resize_area_bilinear

    rng = np.random.default_rng(0)
    m = rng.uniform(0, 1, (2, 64, 64)).astype(np.float32)
    for out in (32, 16, 8):
        got = _resize_area_bilinear(m, out)
        want = np.asarray(
            jax.image.resize(jnp.asarray(m), (2, out, out), "bilinear")
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    # hand-computed fixture: 4 -> 2 triangle weights are
    # [0.75, 0.75, 0.25, 0] / 1.75 per output sample (support = scale = 2)
    m4 = np.arange(4, dtype=np.float32).reshape(1, 1, 4)
    w = np.array([0.75, 0.75, 0.25, 0.0]) / 1.75
    want0 = float((m4[0, 0] * w).sum())
    got = _resize_area_bilinear(np.repeat(m4, 4, axis=1), 2)
    np.testing.assert_allclose(got[0, 0, 0], want0, atol=1e-6)


def test_dataset_pyramid_modes(tmp_path):
    rec = tmp_path / "r.npz"
    rng = np.random.default_rng(1)
    t, hw, h8 = 24, 32, 4
    np.savez(
        rec,
        frames=rng.integers(0, 255, (t, hw, hw, 3)).astype(np.uint8),
        pose=rng.integers(0, 255, (t, hw, hw, 3)).astype(np.uint8),
        face_mask=rng.integers(0, 255, (t, h8, h8)).astype(np.uint8),
        lips_mask=rng.integers(0, 255, (t, h8, h8)).astype(np.uint8),
        audio_emb=rng.standard_normal((t, 12, 768)).astype(np.float16),
    )
    meta = tmp_path / "m.json"
    meta.write_text(json.dumps([str(rec)]))
    out = {}
    for mode in ("resize", "meanpool"):
        ds = TalkingVideoDataset([str(meta)], n_sample_frames=4,
                                 pyramid_mode=mode, levels=2)
        item = ds.sample(0, np.random.default_rng(7))
        out[mode] = item["masks"]
    # level 0 identical; level 1 differs between the modes on random masks
    np.testing.assert_allclose(out["resize"][0][1], out["meanpool"][0][1])
    l1_resize = out["resize"][1][1]
    l1_pool = out["meanpool"][1][1]
    assert l1_resize.shape == l1_pool.shape
    # the modes genuinely differ (antialiased triangle vs box mean)
    assert np.abs(l1_resize - l1_pool).max() > 1e-4


def test_batches_smaller_dataset_than_batch(tmp_path):
    """A dataset with fewer records than the batch size still yields
    batches (previously the epoch loop spun forever)."""
    rec = tmp_path / "r.npz"
    rng = np.random.default_rng(2)
    np.savez(
        rec,
        frames=rng.integers(0, 255, (40, 16, 16, 3)).astype(np.uint8),
        pose=rng.integers(0, 255, (40, 16, 16, 3)).astype(np.uint8),
    )
    meta = tmp_path / "m.json"
    meta.write_text(json.dumps([str(rec)]))
    from mmgt_tpu.data.datasets import HumanDanceDataset

    ds = HumanDanceDataset([str(meta)])
    batch = next(ds.batches(batch_size=4, seed=0))
    assert batch["tgt_image"].shape[0] == 4


def test_talking_video_variants(tmp_path):
    """The _no_audio and _pats reference variants as options
    (talk_video.py:482,931): zeroed audio window / stored full mask."""
    rng = np.random.default_rng(5)
    t, hw, h8 = 30, 64, 8
    rec = tmp_path / "r.npz"
    np.savez(
        rec,
        frames=rng.integers(0, 255, (t, hw, hw, 3), dtype=np.uint8),
        pose=rng.integers(0, 255, (t, hw, hw, 3), dtype=np.uint8),
        face_mask=rng.integers(0, 255, (t, h8, h8), dtype=np.uint8),
        lips_mask=rng.integers(0, 255, (t, h8, h8), dtype=np.uint8),
        full_mask=rng.integers(0, 255, (t, h8, h8), dtype=np.uint8),
        audio_emb=rng.random((t, 12, 768)).astype(np.float16),
    )
    meta = tmp_path / "m.json"
    meta.write_text(json.dumps([str(rec)]))

    no_audio = TalkingVideoDataset([str(meta)], n_sample_frames=8,
                                   with_audio=False)
    item = no_audio.sample(0, np.random.default_rng(0))
    assert item["audio_embeds"].shape == (8, 5, 12, 768)
    assert not item["audio_embeds"].any()

    pats = TalkingVideoDataset([str(meta)], n_sample_frames=8,
                               explicit_full_mask=True)
    item_p = pats.sample(0, np.random.default_rng(0))
    base = TalkingVideoDataset([str(meta)], n_sample_frames=8)
    item_b = base.sample(0, np.random.default_rng(0))
    # same window draw, different full-mask source
    np.testing.assert_allclose(item_p["masks"][0][1], item_b["masks"][0][1])
    assert np.abs(item_p["masks"][0][0] - item_b["masks"][0][0]).max() > 1e-3


def test_human_dance_video_dataset(tmp_path):
    """Strided windows + shared crop between target and pose streams
    (reference dance_video.py:15-141)."""
    from mmgt_tpu.data.datasets import HumanDanceVideoDataset

    rng = np.random.default_rng(6)
    t, hw = 60, 64
    # pose == frames so the shared-crop property is directly checkable
    frames = rng.integers(0, 255, (t, hw, hw, 3)).astype(np.uint8)
    rec = tmp_path / "r.npz"
    np.savez(rec, frames=frames, pose=frames)
    meta = tmp_path / "m.json"
    meta.write_text(json.dumps([str(rec)]))

    ds = HumanDanceVideoDataset([str(meta)], n_sample_frames=6, sample_rate=4,
                                width=32, height=32, img_scale=(0.8, 1.0))
    item = ds.sample(0, np.random.default_rng(3))
    assert item["pixel_values"].shape == (6, 32, 32, 3)
    assert item["pose_video"].shape == (6, 32, 32, 3)
    assert item["ref_image"].shape == (32, 32, 3)
    assert item["clip_image"].shape == (hw, hw, 3)  # un-cropped reference
    # identical geometric augmentation on both streams
    np.testing.assert_allclose(
        item["pixel_values"], item["pose_video"] * 2.0 - 1.0, atol=1e-6
    )
    batch = next(ds.batches(2, seed=0))
    assert batch["pixel_values"].shape == (2, 6, 32, 32, 3)
    assert batch["pixel_values"].min() >= -1.0 - 1e-6
