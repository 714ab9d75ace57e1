import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.diffusion import (
    DDIMScheduler,
    ddim_timesteps,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)
from mmgt_tpu.diffusion.gesture import GestureDiffusionSchedule
from mmgt_tpu.diffusion.losses import min_snr_weight
from mmgt_tpu.diffusion.schedules import ScheduleTables, alphas_cumprod_from_betas


def test_beta_schedules_basic():
    for name in ["linear", "scaled_linear", "cosine"]:
        betas = make_beta_schedule(name, 1000, 0.00085, 0.012)
        assert betas.shape == (1000,)
        assert (betas > 0).all() and (betas < 1).all()
    # scaled_linear endpoint values
    b = make_beta_schedule("scaled_linear", 1000, 0.00085, 0.012)
    assert np.isclose(b[0], 0.00085) and np.isclose(b[-1], 0.012)


def test_zero_snr_rescale_terminal():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    rb = rescale_zero_terminal_snr(betas)
    ac = alphas_cumprod_from_betas(rb)
    # terminal SNR exactly zero; first alpha preserved
    assert abs(ac[-1]) < 1e-12
    ac0 = alphas_cumprod_from_betas(betas)
    assert np.isclose(ac[0], ac0[0], rtol=1e-6)


def test_trailing_timesteps():
    ts = ddim_timesteps(1000, 30, "trailing")
    assert ts[0] == 999  # must start at T-1 for zero-SNR correctness
    assert ts[-1] > 0 or ts[-1] == ts[-1]  # descending, within range
    assert (np.diff(ts) < 0).all()
    assert len(ts) == 30
    ts50 = ddim_timesteps(1000, 50, "trailing")
    assert ts50[0] == 999 and len(ts50) == 50


def test_ddim_roundtrip_vpred():
    """Denoising with the exact v of a known x0 recovers x0 at the end."""
    sched = DDIMScheduler(
        num_train_timesteps=1000,
        beta_schedule="linear",
        prediction_type="v_prediction",
        rescale_betas_zero_snr=True,
        timestep_spacing="trailing",
    )
    state = sched.init(30)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    # start from pure noise (alpha_prod[999] == 0 under zero-SNR)
    x = sched.add_noise(x0, noise, jnp.asarray([999, 999]))
    np.testing.assert_allclose(np.asarray(x), np.asarray(noise), atol=1e-5)
    for i in range(30):
        t = state.timesteps[i]
        v = sched.get_velocity(x0, noise, jnp.full((2,), t))
        # oracle v: model that predicts the true velocity for (x0, noise)
        # at every step; but x drifts from the exact (x0, noise) mixture as
        # steps proceed, so recompute noise consistent with current x:
        a_t = state.alpha_prod[i]
        eps = jnp.where(
            a_t < 1.0,
            (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t),
            noise,
        )
        v = jnp.sqrt(a_t) * eps - jnp.sqrt(1.0 - a_t) * x0
        x = sched.step(state, v, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddim_epsilon_matches_manual():
    sched = DDIMScheduler(
        num_train_timesteps=100,
        beta_start=1e-4,
        beta_end=0.02,
        beta_schedule="linear",
        prediction_type="epsilon",
        rescale_betas_zero_snr=False,
        timestep_spacing="leading",
        steps_offset=0,
    )
    state = sched.init(10)
    x = jnp.ones((1, 2, 2))
    eps = 0.5 * jnp.ones((1, 2, 2))
    out = sched.step(state, eps, 0, x)
    a_t = float(state.alpha_prod[0])
    a_prev = float(state.alpha_prod_prev[0])
    x0 = (1.0 - np.sqrt(1 - a_t) * 0.5) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * 0.5
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, rtol=1e-5)


def test_min_snr_weight():
    tables = ScheduleTables(make_beta_schedule("linear", 1000, 0.00085, 0.012))
    t = jnp.asarray([0, 500, 999])
    w_v = min_snr_weight(tables, t, 5.0, "v_prediction")
    w_e = min_snr_weight(tables, t, 5.0, "epsilon")
    assert w_v.shape == (3,)
    # early timesteps have huge SNR -> v weight ~ gamma/(snr+1) ~ small
    snr = np.asarray(tables.snr)
    np.testing.assert_allclose(
        np.asarray(w_v), np.minimum(snr[[0, 500, 999]], 5.0) / (snr[[0, 500, 999]] + 1),
        rtol=1e-5,
    )
    assert np.all(np.asarray(w_e) > 0)


def test_gesture_ddim_sampler_oracle():
    """With a denoiser that always returns a fixed x0, sampling converges to it."""
    import jax

    sched = GestureDiffusionSchedule(n_timestep=1000)
    target = jnp.clip(
        jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 6)), jnp.float32),
        -1,
        1,
    )

    def denoise_fn(x, t, w):
        return jnp.broadcast_to(target, x.shape)

    out = sched.ddim_sample(
        denoise_fn, jax.random.PRNGKey(0), (2, 16, 6), sampling_timesteps=50
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)


def test_gesture_losses():
    sched = GestureDiffusionSchedule()
    rng = np.random.default_rng(2)
    out = jnp.asarray(rng.standard_normal((2, 80, 402)), jnp.float32)
    total, comps = sched.losses(out, out)
    assert float(total) == 0.0
    tgt = out + 1.0
    total, comps = sched.losses(out, tgt)
    # constant offset: pos terms = 1, velocity/accel = 0
    np.testing.assert_allclose(float(comps["pos"]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(comps["vel"]), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(total), 1.0 + 3.0, rtol=1e-5)


def test_guidance_weight_clipping():
    sched = GestureDiffusionSchedule(guidance_weight=2.0)
    assert float(sched.guidance_weight_at(jnp.asarray(50.0))) == 1.0
    assert float(sched.guidance_weight_at(jnp.asarray(500.0))) == 2.0


def test_stage2_ddim_zero_snr_golden_tables():
    """Golden test of the Stage-2 scheduler tables against an independent
    numpy transcription of the published diffusers algorithm (DDIMScheduler
    with linear betas 0.00085..0.012 + rescale_betas_zero_snr (Lin et al.)
    + trailing spacing — the reference config, animation.yaml:78-90), plus
    hard literals so a regression in EITHER implementation trips.
    """
    sch = DDIMScheduler()  # defaults == reference config
    T, S = 1000, 25

    # independent computation
    betas = np.linspace(0.00085, 0.012, T, dtype=np.float64)
    ac = np.cumprod(1 - betas)
    sq = np.sqrt(ac)
    sq = (sq - sq[-1]) * sq[0] / (sq[0] - sq[-1])
    ac_znr = sq**2
    ts_ref = np.round(np.arange(T, 0, -T / S)).astype(np.int64) - 1

    np.testing.assert_allclose(
        np.asarray(sch.tables.alphas_cumprod), ac_znr, atol=1e-7
    )
    state = sch.init(S)
    np.testing.assert_array_equal(np.asarray(state.timesteps), ts_ref)
    np.testing.assert_allclose(
        np.asarray(state.alpha_prod), ac_znr[ts_ref], rtol=1e-5, atol=1e-8
    )
    prev = ts_ref - T // S
    ref_prev = np.where(prev >= 0, ac_znr[np.maximum(prev, 0)], 1.0)
    np.testing.assert_allclose(
        np.asarray(state.alpha_prod_prev), ref_prev, rtol=1e-5, atol=1e-8
    )

    # hard literals (computed from the published closed forms)
    assert ts_ref[:5].tolist() == [999, 959, 919, 879, 839]
    np.testing.assert_allclose(
        np.asarray(sch.tables.alphas_cumprod)[[999, 959, 919, 879]],
        [0.0, 0.0001225332823, 0.0006003574544, 0.001650893611],
        rtol=1e-5, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(sch.tables.alphas_cumprod)[[119, 79, 39]],
        [0.8272114676, 0.8978997327, 0.9564931827],
        rtol=1e-6,
    )
    assert float(sch.tables.alphas_cumprod[-1]) == 0.0  # exact zero SNR
    np.testing.assert_allclose(float(sch.tables.betas[0]), 0.00085, rtol=1e-6)
    np.testing.assert_allclose(float(sch.tables.betas[-1]), 1.0, atol=1e-6)

    # v-prediction step(): manual closed form at step_index 1 (t=959)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    v = rng.standard_normal((2, 4)).astype(np.float32)
    a_t, a_prev = ac_znr[959], ac_znr[919]
    x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
    eps = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    got = sch.step(state, jnp.asarray(v), 1, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
