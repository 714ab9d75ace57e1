"""Real-media integration: the reference's own demo assets through every
host decode path (VERDICT r2 missing #4 / next #5).

`/root/reference/config/cases/oliver#103842_slice18.*` is the reference's
de-facto e2e fixture (reference README.md:49): a 512x512 portrait png, a
3.2 s wav, the source clip, and the face/lips mask mp4s its pipeline
consumes. These tests feed the REAL bytes through utils/media.py, the
DSP feature stack, conditioning, and (slow) the tiny-model audio2vid
pipeline end-to-end.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CASES = Path("/root/reference/config/cases")
STEM = "oliver#103842_slice18"

pytestmark = pytest.mark.skipif(
    not (CASES / f"{STEM}.wav").exists(), reason="reference fixture absent"
)


def test_load_fixture_image_and_videos():
    from mmgt_tpu.utils.media import get_fps, load_image, read_frames

    img = load_image(str(CASES / f"{STEM}.png"))
    assert img.shape == (512, 512, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0 and img.std() > 0.05

    vid = read_frames(str(CASES / f"{STEM}.mp4"), max_frames=10)
    assert vid.shape == (10, 512, 512, 3) and vid.dtype == np.uint8
    fps = get_fps(str(CASES / f"{STEM}.mp4"))
    assert 20.0 <= fps <= 31.0

    face = read_frames(str(CASES / f"{STEM}_face_mask.mp4"))
    lips = read_frames(str(CASES / f"{STEM}_lips_mask.mp4"))
    assert face.shape[0] == lips.shape[0] >= 80
    # mask videos are near-binary
    assert (face > 200).mean() + (face < 50).mean() > 0.95


def test_fixture_wav_through_dsp():
    """44.1 kHz mono wav -> resample -> the full 35-d baseline feature
    stack (mel/MFCC/chroma/onset/beat) on real speech audio."""
    from mmgt_tpu.data.audio import SAMPLE_RATE, slice_audio, stage1_condition
    from mmgt_tpu.data.dsp import load_wav

    wav = load_wav(str(CASES / f"{STEM}.wav"), SAMPLE_RATE)
    assert abs(len(wav) / SAMPLE_RATE - 3.2) < 0.1
    assert np.abs(wav).max() <= 1.001 and np.abs(wav).std() > 1e-3

    slices = slice_audio(wav) if len(wav) / SAMPLE_RATE > 3.3 else [wav]
    feats = stage1_condition(slices[0], None, "baseline")
    assert feats.shape == (80, 35)
    assert np.isfinite(feats).all()
    assert feats.std() > 0  # real features, not silence/constants


def test_fixture_masks_through_conditioning():
    """The reference's REAL face/lips mask videos -> blur/pyramid
    conditioning (the masks_from_videos path used by scripts/pose2vid)."""
    from mmgt_tpu.data.conditioning import masks_from_videos
    from mmgt_tpu.utils.media import read_frames

    f = 8
    face = read_frames(str(CASES / f"{STEM}_face_mask.mp4"), max_frames=f)
    lips = read_frames(str(CASES / f"{STEM}_lips_mask.mp4"), max_frames=f)
    face = jnp.asarray(face[..., 0], jnp.float32) / 255.0
    lips = jnp.asarray(lips[..., 0], jnp.float32) / 255.0

    masks = masks_from_videos(face, lips)
    assert len(masks) == 3
    for l, (full, fm, lm) in enumerate(masks):
        n = (64 >> l) ** 2
        assert full.shape == (1, f, n)
        for m in (full, fm, lm):
            a = np.asarray(m)
            assert np.isfinite(a).all()
            assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-5  # resize eps
    # face mask level 0 has real structure (face region lights up)
    fm0 = np.asarray(masks[0][1]).reshape(f, 64, 64)
    assert fm0.max() > 0.9 and fm0.mean() < 0.6


@pytest.mark.slow
def test_fixture_audio2vid_end_to_end_tiny():
    """Full flagship path on the REAL fixture: oliver wav + portrait ->
    tiny-model SMGA sampling -> rasterize -> tiny Stage-2 diffusion ->
    frames. Every host decode path runs on real bytes."""
    from mmgt_tpu.config import InferenceConfig
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.models.pose_guider import PoseGuider
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.pipelines.audio2vid import Audio2VideoPipeline
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.training.stage1 import SMGA
    from mmgt_tpu.utils.media import load_image

    H = W = 64
    F = 8
    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    pipe = Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=PoseGuider(
            embedding_channels=16, block_out_channels=(4, 8, 8, 16)
        ),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
        context_overlap=2,
        window_microbatch=None,
    )
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, H, W)
    smga = SMGA(feature_type="baseline")  # fixed production architecture
    smga_state = smga.init_state(jax.random.PRNGKey(1), 1)

    a2v = Audio2VideoPipeline(
        smga=smga,
        smga_params=smga_state.params,
        pose2vid=pipe,
        pose2vid_params=params,
        config=InferenceConfig(
            width=W, height=H, video_length=F,
            num_inference_steps=2, a2p_sampling_steps=2,
            use_motion_selection=False,
        ),
    )

    ref_img = load_image(str(CASES / f"{STEM}.png"), H)
    rng2 = np.random.default_rng(0)
    kp = np.zeros((134, 3), np.float32)  # no DWPose weights in-image:
    kp[:, 0] = rng2.uniform(0.3 * W, 0.7 * W, 134)  # synthetic portrait kpts
    kp[:, 1] = rng2.uniform(0.2 * H, 0.9 * H, 134)
    kp[:, 2] = 1.0

    out = a2v(
        jax.random.PRNGKey(2), str(CASES / f"{STEM}.wav"), ref_img,
        kp.reshape(-1), video_length=F,
    )
    assert out["frames"].shape == (F, H, W, 3)
    assert np.isfinite(out["frames"]).all()
    assert out["keypoints"].shape[0] == F
    assert np.isfinite(out["keypoints"]).all()
