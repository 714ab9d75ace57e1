"""Scheduler-agnostic solver tables (diffusion/solver.py): the unified
step must reproduce the legacy DDIM(eta=0) and DPM++(2M) trajectories, and
the pipeline must compile ONE chunk program shared by both samplers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.diffusion.ddim import DDIMScheduler
from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M
from mmgt_tpu.diffusion.solver import (
    SolverTables,
    init_solver_carry,
    solver_step,
    solver_tables_for,
)


def _run_legacy(scheduler, num_steps, x, outs):
    state = scheduler.init(num_steps)
    carry = scheduler.init_carry(x)
    for s in range(num_steps):
        x, carry = scheduler.step_carry(state, outs[s], s, x, carry)
    return x


def _run_unified(scheduler, num_steps, x, outs):
    tabs = solver_tables_for(scheduler, num_steps)
    assert isinstance(tabs, SolverTables)
    carry = init_solver_carry(x)
    for s in range(num_steps):
        x, carry = solver_step(tabs, outs[s], s, x, carry,
                               scheduler.prediction_type)
    return x


@pytest.mark.parametrize("steps", [25, 15, 12])
@pytest.mark.parametrize("pred", ["v_prediction", "epsilon"])
def test_unified_matches_legacy_ddim(steps, pred):
    # epsilon parameterization divides by alpha_t, which is 0 at the first
    # zero-SNR timestep — zero-SNR schedules require v-prediction (Lin et
    # al. 2023; the reference config pairs them, animation.yaml:80-90), so
    # the epsilon variant is tested on a plain SD1.4-style schedule.
    sch = DDIMScheduler(
        prediction_type=pred,
        rescale_betas_zero_snr=(pred == "v_prediction"),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    outs = [
        jnp.asarray(0.3 * rng.standard_normal(x.shape), jnp.float32)
        for _ in range(steps)
    ]
    a = np.asarray(_run_legacy(sch, steps, x, outs))
    b = np.asarray(_run_unified(sch, steps, x, outs))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("steps", [15, 12])
def test_unified_matches_legacy_dpm(steps):
    sch = DPMSolverPlusPlus2M()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    outs = [
        jnp.asarray(0.3 * rng.standard_normal(x.shape), jnp.float32)
        for _ in range(steps)
    ]
    a = np.asarray(_run_legacy(sch, steps, x, outs))
    b = np.asarray(_run_unified(sch, steps, x, outs))
    np.testing.assert_allclose(b, a, atol=0, rtol=0)  # same tables, same math


def test_eta_ddim_falls_back():
    assert solver_tables_for(DDIMScheduler(eta=1.0), 10) is None
    assert solver_tables_for(DDIMScheduler(clip_sample=True), 10) is None


def test_pipeline_shares_chunk_program_across_schedulers():
    """Swapping DDIM -> DPM on the same pipeline must NOT retrace the
    denoise chunk (r4 paid 184.7 s of compile for the DPM bench row)."""
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.models.pose_guider import PoseGuider
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    tiny = dict(block_out_channels=(16, 32), heads=4)
    pipe = Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=PoseGuider(embedding_channels=16,
                               block_out_channels=(4, 8, 8, 16)),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
        steps_per_launch=5,
    )
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, 64, 64)
    h8 = 8
    ref = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pose = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    clip = jnp.zeros((1, 1, 768), jnp.float32)
    masks = [
        tuple(jnp.ones((1, 4, (h8 >> l) * (h8 >> l)), jnp.float32)
              for _ in range(3))
        for l in range(3)
    ]
    audio = jnp.zeros((1, 4, 5, 12, 768), jnp.float32)

    def run():
        return pipe(params, rng, ref, pose, clip, masks, audio,
                    num_inference_steps=10, guidance_scale=3.5)

    out_ddim = np.asarray(run())
    misses0 = pipe._denoise_chunk._cache_size()
    pipe.scheduler = DPMSolverPlusPlus2M()
    out_dpm = np.asarray(run())
    misses1 = pipe._denoise_chunk._cache_size()
    assert misses1 == misses0, "DPM swap retraced the denoise chunk"
    assert np.isfinite(out_dpm).all()
    # different solver => different trajectory (sanity that the tables,
    # not the compiled program, carry the sampler identity)
    assert not np.allclose(out_ddim, out_dpm)
