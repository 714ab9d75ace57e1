import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.config import InferenceConfig, Stage2TrainConfig, load_config
from mmgt_tpu.models.audio_proj import AudioProjModel
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.pipelines.audio2vid import (
    Audio2VideoPipeline,
    candidate_scores,
    find_best_slice,
    smooth_seams,
)
from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
from mmgt_tpu.training.stage1 import SMGA
from mmgt_tpu.utils.checkpoint import CheckpointManager


def test_find_best_slice_prefers_continuity():
    prev = np.zeros((80, 402), np.float32)
    prev[:, 0] = np.linspace(0, 1, 80)  # steady motion
    good = np.zeros((80, 402), np.float32)
    good[:5, 0] = prev[-5:, 0]  # starts where prev ended
    bad = good + 5.0
    assert find_best_slice([bad, good], prev) is good


def test_candidate_scores_matches_find_best_slice():
    """The on-device selection (candidate_scores argmin, used inside the
    single-launch stage-1 scan) must agree with the host find_best_slice
    on random candidate sets."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        prev = rng.normal(0, 0.3, (80, 402)).astype(np.float32)
        cands = [
            rng.normal(0, 0.3, (80, 402)).astype(np.float32) for _ in range(4)
        ]
        want = find_best_slice(cands, prev)
        scores = np.asarray(
            candidate_scores(jnp.asarray(np.stack(cands)), jnp.asarray(prev[-6:]))
        )
        got = cands[int(np.argmin(scores))]
        assert got is want, (trial, scores)


def _tiny_smga(rng):
    from mmgt_tpu.models.smga import GestureDecoder

    smga = SMGA(feature_type="baseline")
    smga.model = GestureDecoder(
        seq_len=80, latent_dim=64, ff_size=64, num_layers=1, num_heads=4,
        cond_feature_dim=smga.cond_dim,
    )
    return smga, smga.init_state(rng, batch_size=1)


def test_smga_sample_chained_matches_per_slice_loop(tmp_path):
    """One-launch scan over slices (n_cand=1) must reproduce the per-slice
    dispatch loop exactly: same key chain -> same noise draws -> same
    chained last-frame conditioning."""
    from mmgt_tpu.data.audio import slice_audio, stage1_condition

    rng = jax.random.PRNGKey(1)
    smga, state = _tiny_smga(rng)
    cfg = InferenceConfig(a2p_sampling_steps=3)
    pipe = Audio2VideoPipeline(
        smga=smga, smga_params=state.ema_params,
        pose2vid=None, pose2vid_params=None, config=cfg,
    )
    wav = (0.1 * np.sin(np.linspace(0, 4000, 8 * 16000))).astype(np.float32)
    slices = slice_audio(wav)
    assert len(slices) == 3  # bucket pads to 4: padding must not leak
    conds = np.stack(
        [stage1_condition(sl, None, "baseline") for sl in slices]
    )
    init_cf = jnp.asarray(
        np.random.default_rng(2).normal(0, 0.2, (402,)), jnp.float32
    )

    r = jax.random.PRNGKey(7)
    keys = []
    for _ in range(4):
        r, k = jax.random.split(r)
        keys.append(k)

    chained = np.asarray(
        pipe._smga_sample_chained(
            state.ema_params, jnp.stack(keys), init_cf,
            jnp.asarray(np.concatenate([conds, np.zeros_like(conds[:1])])), 1
        )
    )[:3]

    last = init_cf.reshape(1, -1)
    loop = []
    for i in range(3):
        out = np.asarray(
            pipe._smga_sample(
                state.ema_params, keys[i], last, jnp.asarray(conds[i])[None]
            )
        )[0]
        loop.append(out)
        last = jnp.asarray(out[-1]).reshape(1, -1)
    np.testing.assert_allclose(chained, np.stack(loop), atol=2e-5, rtol=1e-4)


def test_generate_pose_with_selection_single_launch():
    """Selection path: candidates sampled and selected on device, full
    pose sequence comes back in one piece with the portrait prepended."""
    rng = jax.random.PRNGKey(3)
    smga, state = _tiny_smga(rng)
    cfg = InferenceConfig(
        a2p_sampling_steps=2, use_motion_selection=True, motion_candidates=3
    )
    pipe = Audio2VideoPipeline(
        smga=smga, smga_params=state.ema_params,
        pose2vid=None, pose2vid_params=None, config=cfg,
    )
    wav = (0.1 * np.sin(np.linspace(0, 2000, 4 * 16000))).astype(np.float32)
    init_kp = np.zeros((402,), np.float32)
    init_kp.reshape(134, 3)[:, :2] = 256.0
    init_kp.reshape(134, 3)[:, 2] = 1.0
    seq = pipe.generate_pose(rng, wav, init_kp)
    assert seq.shape == (2 * 80, 402)  # 2 slices, portrait prepended
    assert np.isfinite(seq).all()


def test_smooth_seams_reduces_jump():
    seq = np.zeros((160, 402), np.float32)
    seq[80:] = 1.0  # hard seam at 80
    sm = smooth_seams(seq, seam_spacing=80)
    jumps = np.abs(np.diff(sm[:, 0]))
    assert jumps.max() < 1.0  # the unit step is spread out
    # far from the seam, unchanged
    np.testing.assert_allclose(sm[:70], seq[:70])
    np.testing.assert_allclose(sm[90:], seq[90:])


def test_checkpoint_manager_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    for step in (1, 2, 3):
        mgr.save(step, jax.tree.map(lambda x: x * step, tree))
    assert mgr.latest_step() == 3
    restored = mgr.restore(tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4.0) * 3)


def test_config_load_and_overrides(tmp_path):
    cfg = load_config(InferenceConfig, None, num_inference_steps=7)
    assert cfg.num_inference_steps == 7 and cfg.guidance_scale == 3.5
    p = tmp_path / "c.json"
    p.write_text('{"train_width": 256, "max_train_steps": 10}')
    c2 = load_config(Stage2TrainConfig, str(p))
    assert c2.train_width == 256 and c2.max_train_steps == 10


@pytest.mark.slow
def test_audio2vid_end_to_end_tiny(tmp_path):
    from mmgt_tpu.data.dsp import save_wav

    wav = (0.1 * np.sin(np.linspace(0, 800, 16000))).astype(np.float32)
    wav_path = str(tmp_path / "a.wav")
    save_wav(wav_path, wav, 16000)

    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    pose2vid = Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=PoseGuider(embedding_channels=16, block_out_channels=(4, 8, 8, 16)),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
        context_overlap=2,
    )
    rng = jax.random.PRNGKey(0)
    p2v_params = pose2vid.init_params(rng, 64, 64)

    from mmgt_tpu.models.smga import GestureDecoder

    smga = SMGA(feature_type="baseline")
    smga.model = GestureDecoder(
        seq_len=80, latent_dim=64, ff_size=64, num_layers=1, num_heads=4,
        cond_feature_dim=smga.cond_dim,
    )
    smga_state = smga.init_state(rng, batch_size=1)

    cfg = InferenceConfig(
        width=64,
        height=64,
        video_length=6,
        num_inference_steps=2,
        a2p_sampling_steps=3,
        window_microbatch=None,
    )
    pipe = Audio2VideoPipeline(
        smga=smga,
        smga_params=smga_state.ema_params,
        pose2vid=pose2vid,
        pose2vid_params=p2v_params,
        config=cfg,
    )
    init_kp = np.zeros((402,), np.float32)
    init_kp.reshape(134, 3)[:, 0] = 256.0
    init_kp.reshape(134, 3)[:, 1] = 256.0
    init_kp.reshape(134, 3)[:, 2] = 1.0

    out = pipe(rng, wav_path, np.zeros((64, 64, 3), np.float32), init_kp)
    assert out["frames"].shape == (6, 64, 64, 3)
    assert np.isfinite(out["frames"]).all()
    assert out["keypoints"].shape[1] == 402


def test_prepare_cond_chunked_matches_single_launch():
    """Chunked rasterization (one slice-sized program re-launched) must be
    exactly the single-launch conditioning — per-frame ops, incl. a
    non-multiple tail handled by last-frame padding."""
    rng = jax.random.PRNGKey(5)
    smga, state = _tiny_smga(rng)
    pipe = Audio2VideoPipeline(
        smga=smga, smga_params=state.ema_params,
        pose2vid=None, pose2vid_params=None,
        config=InferenceConfig(width=64, height=64),
        raster_chunk=4,
    )
    kp = np.zeros((10, 402), np.float32)
    kp.reshape(10, 134, 3)[..., 0] = np.linspace(10, 50, 10)[:, None]
    kp.reshape(10, 134, 3)[..., 1] = 32.0
    kp.reshape(10, 134, 3)[..., 2] = 1.0
    kp = jnp.asarray(kp)
    want = pipe._prepare_cond(kp)
    got = pipe._prepare_cond_chunked(kp)
    np.testing.assert_allclose(
        np.asarray(got["pose_video"]), np.asarray(want["pose_video"]),
        atol=1e-6,
    )
    for l in range(3):
        for j in range(3):
            np.testing.assert_allclose(
                np.asarray(got["masks"][l][j]),
                np.asarray(want["masks"][l][j]), atol=1e-6,
            )
    for name in want["mask_videos"]:
        np.testing.assert_allclose(
            np.asarray(got["mask_videos"][name]),
            np.asarray(want["mask_videos"][name]), atol=1e-6,
        )
