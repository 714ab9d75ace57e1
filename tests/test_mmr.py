import numpy as np
import pytest

from mmgt_tpu.data.mmr import (
    NativeWindowLoader,
    build_native,
    read_mmr,
    write_mmr,
)


def _record(path, t=40, size=16):
    rng = np.random.default_rng(0)
    fields = {
        "frames": rng.integers(0, 255, (t, size, size, 3), dtype=np.uint8),
        "pose": rng.integers(0, 255, (t, size, size, 3), dtype=np.uint8),
        "face_mask": rng.integers(0, 255, (t, 8, 8), dtype=np.uint8),
        "lips_mask": rng.integers(0, 255, (t, 8, 8), dtype=np.uint8),
        "hands_mask": np.zeros((t, 8, 8), np.uint8),
        "audio_emb": rng.random((t, 12, 32)).astype(np.float16),
    }
    write_mmr(str(path), fields)
    return fields


def test_mmr_write_read_roundtrip(tmp_path):
    p = tmp_path / "a.mmr"
    fields = _record(p)
    back = read_mmr(str(p))
    assert set(back) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_native_loader_builds_and_samples(tmp_path):
    if build_native() is None:
        pytest.skip("g++ unavailable")
    paths = []
    all_fields = []
    for i in range(2):
        p = tmp_path / f"r{i}.mmr"
        all_fields.append(_record(p, t=40))
        paths.append(str(p))

    loader = NativeWindowLoader(paths, n_frames=12, margin=2, seed=7,
                                n_workers=2)
    starts = set()
    for _ in range(20):
        s = loader.next()
        start, clip = int(s["_start"]), int(s["_clip"])
        starts.add((clip, start))
        assert s["frames"].shape == (12, 16, 16, 3)
        assert s["audio_emb"].shape == (12, 12, 32)
        assert s["frames_ref"].shape == (16, 16, 3)
        # window content matches the mmap'd source exactly
        np.testing.assert_array_equal(
            s["frames"], all_fields[clip]["frames"][start : start + 12]
        )
        np.testing.assert_array_equal(
            s["face_mask"], all_fields[clip]["face_mask"][start : start + 12]
        )
        assert 2 <= start <= 40 - 12 - 2
    loader.close()
    assert len(starts) > 3  # randomized sampling
